"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
ray.init()/ray.shutdown() happens here or anywhere in the library
(sessions are owned by bench.py / the CLI / the test fixture).

- ``entry()``  — flagship extraction pipeline on the deterministic
  synthetic web corpus (sf0.001-scale smoke).
- ``queries()`` — one callable(sf_dir) per implemented operator from
  SURVEY.md §2 plus the training-data ops (dedup, similarity search,
  text analysis, multimodal plumbing).
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
  query (same column names, integer micro-units for float aggregates).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline at smoke scale; driver checks rows >= 0."""
    from documentconvert_ray.pipelines.queries import q_extract_pipeline

    return q_extract_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from documentconvert_ray.pipelines.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from documentconvert_ray.pipelines.queries import oracle_sql as _o

    return _o()
