"""Aho-Corasick multi-pattern substring matching — the real automaton
behind the substring-blocklist stage (token-level scrubbing can't
catch in-word matches; substring blocklists are the standard curation
shape for slurs/PII fragments/spam markers).

Pure-python goto/fail/output construction (Aho & Corasick 1975,
CACM 18(6)); matching is a single pass over the text per document,
independent of pattern count. Counts include OVERLAPPING occurrences;
for borderless patterns (no proper prefix == suffix) this equals the
non-overlapping count, which is what the SQL replace()-trick oracle
computes — the operator asserts borderlessness at build time so the
mirror is exact by construction.
"""

from __future__ import annotations

from collections import deque

__all__ = ["AhoCorasick"]


class AhoCorasick:
    """Build once per actor (__init__ cost amortized across batches),
    scan many: ``counts(text)`` returns per-pattern occurrence counts
    in one left-to-right pass."""

    def __init__(self, patterns: list[str],
                 require_borderless: bool = True) -> None:
        if require_borderless:
            for p in patterns:
                for k in range(1, len(p)):
                    if p[:k] == p[-k:]:
                        raise ValueError(
                            f"pattern {p!r} has a border ({p[:k]!r}); "
                            "overlap semantics would diverge from the "
                            "non-overlapping oracle")
        self.patterns = list(patterns)
        # goto: list of dict[ch -> state]; output: pattern indices
        self._next: list[dict[str, int]] = [{}]
        self._out: list[list[int]] = [[]]
        for idx, p in enumerate(patterns):
            s = 0
            for ch in p:
                nxt = self._next[s].get(ch)
                if nxt is None:
                    self._next.append({})
                    self._out.append([])
                    nxt = len(self._next) - 1
                    self._next[s][ch] = nxt
                s = nxt
            self._out[s].append(idx)
        # BFS failure links
        self._fail = [0] * len(self._next)
        q: deque[int] = deque()
        for s in self._next[0].values():
            q.append(s)
        while q:
            s = q.popleft()
            for ch, t in self._next[s].items():
                q.append(t)
                f = self._fail[s]
                while f and ch not in self._next[f]:
                    f = self._fail[f]
                self._fail[t] = self._next[f].get(ch, 0)
                if self._fail[t] == t:  # root self-loop guard
                    self._fail[t] = 0
                self._out[t] += self._out[self._fail[t]]

    def counts(self, text: str) -> list[int]:
        """Occurrence count per pattern (overlapping; == non-overlap
        for the borderless patterns this class enforces)."""
        c = [0] * len(self.patterns)
        s = 0
        nxt, fail, out = self._next, self._fail, self._out
        for ch in text:
            while s and ch not in nxt[s]:
                s = fail[s]
            s = nxt[s].get(ch, 0)
            for idx in out[s]:
                c[idx] += 1
        return c
