"""Pure, deterministic, Ray-free functions: the extraction core.

Everything in this package is `bytes/str -> value` with no I/O, no wall
clock, no randomness, and no dict-order dependence — the property the
byte-identical-per-url invariant rests on (SURVEY.md §7.4).
"""
