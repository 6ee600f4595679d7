"""Continuous-ingestion dedup: the foreachBatch corpus-dedup hook admits
each doc at most once (exact or near), is idempotent under batch replay,
and behaves identically driven by a real file-source stream."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lichess_event_stream_watcher_spark import testdata
from lichess_event_stream_watcher_spark.operators import dedup as D
from lichess_event_stream_watcher_spark.streaming.dedup import (
    StreamingCorpusDedup,
    run_corpus_dedup_stream,
)


def _batches(spark, sf_dir, k=3):
    docs = testdata.load(spark, sf_dir, "documents")
    return docs, [docs.filter(F.col("doc_id") % k == i) for i in range(k)]


def _assert_no_dups(corpus):
    assert D.jaccard_pairs(corpus, n=2, threshold=0.5).count() == 0
    n = corpus.count()
    assert corpus.select(D.fingerprint(F.col("text"))).distinct().count() == n


def test_corpus_dedup_hook_admits_once(spark, sf_dir, tmp_path):
    docs, batches = _batches(spark, sf_dir)
    hook = StreamingCorpusDedup(spark, str(tmp_path / "corpus"))
    for i, b in enumerate(batches):
        hook.process_batch(b, i)
    corpus = hook.corpus()
    _assert_no_dups(corpus)
    # every original doc is either admitted or near/exact-dup of an admitted one
    n_admitted = corpus.count()
    assert 0 < n_admitted <= docs.count()
    # batch replay is idempotent: foreachBatch can re-deliver the LAST
    # batch after a restart; re-running it must change nothing
    before = sorted(r.doc_id for r in corpus.select("doc_id").collect())
    hook.process_batch(batches[2], 2)
    after = sorted(r.doc_id for r in hook.corpus().select("doc_id").collect())
    assert before == after


def test_corpus_dedup_streaming_end_to_end(spark, sf_dir, tmp_path):
    docs, batches = _batches(spark, sf_dir)
    land = tmp_path / "landing"
    for i, b in enumerate(batches):
        b.coalesce(1).write.parquet(str(land / f"drop{i}"))
    files = sorted(str(p) for p in land.glob("drop*/*.parquet"))
    stage = tmp_path / "stage"
    stage.mkdir()
    for i, f in enumerate(files):
        os.link(f, stage / f"{i:04d}.parquet")

    hook = StreamingCorpusDedup(spark, str(tmp_path / "corpus"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)  # one landing file per micro-batch
        .parquet(str(stage))
    )
    q = run_corpus_dedup_stream(stream, hook, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    corpus = hook.corpus()
    _assert_no_dups(corpus)
    assert corpus.count() > 0


def test_crashed_batch_staging_dir_is_not_history(spark, sf_dir, tmp_path):
    """Round-7 review fix: a crash between the parquet write and the
    rename leaves corpus_dir/batch=N._tmp behind. On replay, that
    staging dir must be invisible to corpus() — otherwise the replayed
    batch dedups against its own staged output, every doc matches itself
    at J=1.0, and the whole batch silently drops."""
    docs, batches = _batches(spark, sf_dir)
    hook = StreamingCorpusDedup(spark, str(tmp_path / "corpus"))
    hook.process_batch(batches[0], 0)
    n0 = hook.corpus().count()

    # simulate the crash: batch 1's output staged but never renamed
    staged = str(tmp_path / "corpus" / "batch=1._tmp")
    batches[1].limit(5).write.parquet(staged)
    assert hook.corpus().count() == n0  # staging dir is not history
    assert hook.corpus(exclude_batch=1).count() == n0

    # the replayed batch processes normally: stale tmp replaced, docs
    # admitted against batch 0 only
    hook.process_batch(batches[1], 1)
    assert not os.path.exists(staged)
    n01 = hook.corpus().count()
    assert n01 > n0  # the batch was NOT silently dropped
    _assert_no_dups(hook.corpus())
