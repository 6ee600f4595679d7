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


def _brute_hll(vals: list[str], m: int = 256):
    """Reference HLL registers via Python md5 — mirrors the engine's
    hash/register/rho derivation character for character."""
    import hashlib

    big_p = 32 - (m.bit_length() - 1) + 1
    regs: dict[int, int] = {}
    for v in set(vals):
        h = int(hashlib.md5(f"hll|{v}".encode()).hexdigest()[:8], 16)
        reg, w = h % m, h // m
        rho = big_p if w == 0 else (big_p - 1) - w.bit_length() + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    zeros = m - len(regs)
    n = sum(1 << (big_p - rho) for rho in regs.values()) + zeros * (1 << big_p)
    return zeros, n


def test_hll_registers_match_python_md5(spark):
    """Engine HLL register state == the straight-line Python derivation,
    and the estimate lands within 3 standard errors (1.04/sqrt(m)) of
    the truth on both estimator branches."""
    from lichess_event_stream_watcher_spark.operators.sketch import (
        hll_register_stats,
    )

    for n_distinct in (120, 5000):  # linear-counting branch, raw branch
        vals = [str(v % n_distinct) for v in range(2 * n_distinct)]
        df = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
        row = hll_register_stats(df, "g", "v", 256).collect()[0]
        zeros, n = _brute_hll(vals)
        assert (row.zeros, row.N) == (zeros, n)
        k = (0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 * float(1 << 25)
        raw = k / n
        if raw <= 2.5 * 256 and zeros > 0:
            import math

            est = 256 * math.log(256 / zeros)
        else:
            est = raw
        assert abs(est - n_distinct) / n_distinct < 3 * 1.04 / 256 ** 0.5


def test_hll_rejects_non_power_of_two():
    from lichess_event_stream_watcher_spark.operators.sketch import (
        hll_register_stats,
    )

    with pytest.raises(ValueError):
        hll_register_stats(None, "g", "v", 100)


def test_cms_one_sided_and_tight_when_sparse(spark):
    """CMS estimates are NEVER below the true counts (the one-sided
    guarantee — min over d rows of sums of colliding keys), and with
    few keys against d*w counters they are exactly the true counts."""
    from collections import Counter

    from lichess_event_stream_watcher_spark.operators.sketch import cms_estimates

    vals = [i % 37 for i in range(500)] + [999] * 60
    truth = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "k bigint")
    est = {r.k: r.est_count for r in cms_estimates(df, "k", d=4, w=1024).collect()}
    assert set(est) == set(truth)
    assert all(est[k] >= c for k, c in truth.items())
    assert est[999] == 60  # the heavy key estimates exactly at this load


def test_hll_and_quantiles_exclude_nulls(spark):
    """Round-7 review fix: a NULL value must not form a phantom HLL
    register (corrupting zeros and N by a 2^big_p term) nor a phantom
    first quantile bucket (shifting every rank; dropping a quantile row
    when the target rank lands inside it)."""
    from lichess_event_stream_watcher_spark.operators.sketch import (
        grouped_exact_quantiles,
        hll_register_stats,
    )

    with_null = spark.createDataFrame(
        [("g", "a"), ("g", "b"), ("g", None)], "grp string, v string"
    )
    without = spark.createDataFrame([("g", "a"), ("g", "b")], "grp string, v string")
    a = hll_register_stats(with_null, "grp", "v", m=16).collect()[0]
    b = hll_register_stats(without, "grp", "v", m=16).collect()[0]
    assert (a.zeros, a.N) == (b.zeros, b.N)

    qdf = spark.createDataFrame(
        [("g", 1), ("g", 2), ("g", 3), ("g", None)], "grp string, x int"
    )
    out = {
        r.q: (r.n, r.val)
        for r in grouped_exact_quantiles(qdf, "grp", "x", [("median", 1, 2)]).collect()
    }
    assert out["median"] == (3, 2)  # n excludes the NULL; median of {1,2,3}
