"""Property-based cross-check of every Jaccard physical strategy against
a brute-force Python oracle on adversarial corpora: empty and one-token
docs, exact duplicates, shared-prefix families — the shapes that stress
the prefix-filter completeness lemma, the length filter's boundary
(rounding to exactly the threshold), and the dense path's id handling.

Hypothesis drives the corpus; the number of Spark jobs per example is
bounded by deduplicate=True + small sizes (each example runs 3 strategies
over <=12 docs)."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lichess_event_stream_watcher_spark.operators import dedup as D

_WORDS = ["the", "cat", "sat", "on", "a", "mat", "dog", "ran", "far", "x1"]
_DOC = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=2, max_size=12)


def _brute_force(texts, n=2, threshold=0.5):
    def sh(t):
        toks = [w for w in re.split(r"\s+", t.strip().lower()) if w]
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = {i: sh(t) for i, t in enumerate(texts)}
    out = set()
    for a in sets:
        for b in sets:
            if a >= b or not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            j = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
            if j >= threshold:
                out.add((a, b, j))
    return out


@pytest.mark.parametrize("strategy", ["dense", "postings", "prefix"])
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=_CORPUS)
def test_jaccard_strategies_match_brute_force(spark, strategy, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    kw = (
        {}
        if strategy == "dense"
        else {"dense_bytes_limit": 0, "sparse_strategy": strategy}
    )
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in D.jaccard_pairs(df, n=2, threshold=0.5, **kw).collect()
    }
    assert got == _brute_force(texts), (strategy, texts)


_NAME = st.text(alphabet="ab_", min_size=0, max_size=6)


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(names=st.lists(_NAME, min_size=2, max_size=10))
def test_deletion_blocking_matches_brute_force_levenshtein(spark, names):
    from lichess_event_stream_watcher_spark.operators.fuzzy import edit_distance_pairs

    df = spark.createDataFrame([(n,) for n in names], "username string")
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in edit_distance_pairs(df, "username").collect()
    }
    uniq = sorted(set(names))
    want = {
        (a, b, 1)
        for i, a in enumerate(uniq)
        for b in uniq[i + 1 :]
        if _lev(a, b) == 1
    }
    assert got == want, names
