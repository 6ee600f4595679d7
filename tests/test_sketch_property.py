"""Property-based cross-check of the bounded-state sketch primitives
(operators/sketch.py) against brute-force Python oracles on adversarial
shapes: duplicate-heavy multisets, groups below and straddling k, salt
counts at the floor, ties through the full lexicographic key, negative
values, and single-bucket quantile collapses.

These primitives carry exactness PROOFS (threshold bounds, integer
bucket widths); the property tests hunt for the off-by-one at each
proof's boundary rather than re-sampling the happy path."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lichess_event_stream_watcher_spark.operators.sketch import (
    grouped_exact_quantiles,
    grouped_topk_threshold,
    kmin_hashes,
)

_VALS = st.lists(
    st.integers(min_value=0, max_value=300), min_size=1, max_size=60
)
_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=_VALS, k=st.sampled_from([1, 4, 16]))
@settings(**_SETTINGS)
def test_kmin_hashes_property(spark, vals, k):
    """k smallest DISTINCT values per group == brute force, for any
    multiset and any k, including k > distinct count."""
    df = spark.createDataFrame([("g", v) for v in vals], "g string, h bigint")
    out = {
        r.g: list(r.ks)
        for r in kmin_hashes(df, "g", "h", k, hash_ceiling=301, n_salts=16).collect()
    }
    assert out["g"] == sorted(set(vals))[:k]


@given(
    vals=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(0, 9)), min_size=1, max_size=50
    ),
    k=st.sampled_from([1, 3, 8]),
    descending=st.booleans(),
)
@settings(**_SETTINGS)
def test_grouped_topk_threshold_property(spark, vals, k, descending):
    """Per-group top-k rows by a two-column lexicographic key == brute
    force, both directions, under heavy first-key ties. Rows get a
    unique id as the tie-breaking final key column (the documented
    caller contract)."""
    rows = [("g", a, b, i) for i, (a, b) in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, a bigint, b bigint, id bigint")
    out = sorted(
        (r.rk, r.a, r.b, r.id)
        for r in grouped_topk_threshold(
            df, "g", ["a", "b", "id"], k, n_salts=8, descending=descending
        ).collect()
    )
    want_sorted = sorted(
        ((a, b, i) for _, a, b, i in rows), reverse=descending
    )[:k]
    assert out == [(rk + 1, *t) for rk, t in enumerate(want_sorted)]


@given(vals=st.lists(st.integers(-200, 200), min_size=1, max_size=50))
@settings(**_SETTINGS)
def test_grouped_exact_quantiles_property(spark, vals):
    """Type-1 quartiles == brute force rank picks for any integer
    multiset, at a bucket width small enough to force multi-bucket
    refinement and at one large enough to collapse to a single bucket."""
    df = spark.createDataFrame([("g", v) for v in vals], "g string, x bigint")
    qs = [("p25", 1, 4), ("median", 1, 2), ("p75", 3, 4)]
    s, n = sorted(vals), len(vals)
    want = {name: s[-(-num * n // den) - 1] for name, num, den in qs}
    for width in (4, 100_000):
        got = {
            r.q: r.val
            for r in grouped_exact_quantiles(df, "g", "x", qs, bucket_width=width).collect()
        }
        assert got == want, (width, got, want)
