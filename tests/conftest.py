"""Session-scoped Ray fixture: ONE ray.init per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
CORPUS_DIR = os.path.join(FIXTURE_DIR, "corpus")
EXPECTED_PATH = os.path.join(FIXTURE_DIR, "expected.parquet")


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def expected_table():
    import pyarrow.parquet as pq

    return pq.read_table(EXPECTED_PATH)


@pytest.fixture(scope="session")
def expected_by_url(expected_table):
    t = expected_table
    return {
        u: (ok, kind, md, sha, imgs)
        for u, ok, kind, md, sha, imgs in zip(
            t.column("url").to_pylist(),
            t.column("ok").to_pylist(),
            t.column("error_kind").to_pylist(),
            t.column("text_md").to_pylist(),
            t.column("text_sha256").to_pylist(),
            t.column("images").to_pylist(),
        )
    }
