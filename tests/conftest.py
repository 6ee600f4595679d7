from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lichess_event_stream_watcher_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("lesw-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(autouse=True)
def _drain_session_caches():
    """The harness contract from operators/session_cache.py: loops call
    release_session_caches BETWEEN queries. Without this drain a test
    whose operator registers a session cache (cost census, containment,
    band sweep, charlm) leaves its persisted plan in the CacheManager,
    and any LATER test whose plan shares that subtree silently gets an
    InMemoryRelation substituted — breaking plan-shape assertions
    (Generate/Exchange counts) and accumulating storage across the
    suite."""
    yield
    from lichess_event_stream_watcher_spark.operators.session_cache import (
        release_session_caches,
    )

    release_session_caches()


@pytest.fixture()
def duck(sf_dir):
    # FUNCTION-scoped on purpose: duckdb 1.0.0's buffer accounting leaks
    # across a long-lived connection under this suite's 130+ heavy oracle
    # queries (recursive CTEs, 80 KB literal-codebook SQL) — late tests
    # start failing with OutOfMemoryException ("failed to allocate 16384
    # bytes") while the machine has >100 GB free. A fresh connection per
    # test costs ~ms (views over parquet are lazy) and removes the
    # accumulation entirely.
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def driver_norm(df):
    """The driver compare's normalize, shared by the staged-row dress
    rehearsals (and mirrored in .claude/skills/verify/harness.py): sort
    columns by name, floats to 6-decimal strings, NaN/None -> ''."""
    import math

    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return ""
        if isinstance(v, float):
            return format(round(v, 6), ".6f")
        return str(v)

    return sorted(tuple(cell(v) for v in r) for r in df.itertuples(index=False, name=None))
