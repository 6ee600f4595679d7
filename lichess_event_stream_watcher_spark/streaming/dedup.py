"""Continuous-ingestion dedup: a Structured Streaming sink that admits
only documents that are neither exact nor near duplicates of anything
already accepted.

The batch-side operators do all the work (operators.dedup); this module
is the glue that makes them INCREMENTAL: each micro-batch dedups against
itself, then against the accepted-corpus parquet directory via the
cross-corpus inverted join (``jaccard_pairs_between``) — never a
self-join over full history. Survivors append to the corpus atomically
(parquet append of a batch-tagged subdir), so a crashed batch re-runs
idempotently under foreachBatch's replay contract: the batch id keys the
subdir, and a replayed batch overwrites its own output rather than
double-appending.

At 100 TB the accepted corpus is the big side of the join; only its
SHINGLE index is touched (id + shingle columns — the text column never
moves), and the index can be maintained bucketed-by-shingle so each
micro-batch probe is a zero-shuffle bucket join.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D


class StreamingCorpusDedup:
    """foreachBatch hook: admit new docs not duplicating the corpus.

    Admission per micro-batch, in three exact stages:

    1. exact dedup WITHIN the batch (hash-groupBy, keep min id);
    2. near-dup WITHIN the batch (``jaccard_pairs`` — drop the non-min
       side of every qualifying pair, transitively via the pair list);
    3. near-dup AGAINST the accepted corpus (``jaccard_pairs_between``
       — drop any new doc with a qualifying match in history).

    Within-batch survivors write to ``corpus_dir/batch=<id>/``; a replay
    of batch N overwrites only ``batch=N``, keeping delivery effectively
    exactly-once end-to-end (state via the stream checkpoint, output via
    the idempotent per-batch directory).
    """

    def __init__(
        self,
        spark: SparkSession,
        corpus_dir: str,
        n: int = 2,
        threshold: float = 0.5,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        self.spark = spark
        self.corpus_dir = corpus_dir
        self.n = n
        self.threshold = threshold
        self.text_col = text_col
        self.id_col = id_col
        os.makedirs(corpus_dir, exist_ok=True)

    # -- corpus I/O --------------------------------------------------------
    def corpus(self, exclude_batch: int | None = None) -> DataFrame | None:
        # '._tmp' staging dirs are NEVER history: a crash between the
        # parquet write and the rename in process_batch leaves one
        # behind, and treating it as accepted corpus would make the
        # replayed batch dedup against its own staged output — every doc
        # matches itself at J=1.0 and the whole batch silently drops.
        parts = [
            os.path.join(self.corpus_dir, d)
            for d in os.listdir(self.corpus_dir)
            if d.startswith("batch=")
            and not d.endswith("._tmp")
            and d != f"batch={exclude_batch}"
        ]
        if not parts:
            return None
        return self.spark.read.parquet(*parts)

    # -- the admission pipeline -------------------------------------------
    def _dedup_within(self, batch: DataFrame) -> DataFrame:
        tc, ic = self.text_col, self.id_col
        groups = D.exact_dedup_groups(batch, tc, ic)
        exact_kept = batch.join(
            F.broadcast(groups.select(F.col("keep_id").alias(ic))), ic, "left_semi"
        )
        pairs = D.jaccard_pairs(
            exact_kept, n=self.n, threshold=self.threshold, text_col=tc, id_col=ic
        )
        # transitive drop via components: keep only each cluster's min id
        comp = D.dup_components(exact_kept.select(F.col(ic).alias("doc_id")), pairs)
        keep = comp.filter(F.col("id") == F.col("comp")).select(F.col("id").alias(ic))
        return exact_kept.join(F.broadcast(keep), ic, "left_semi")

    def _dedup_against_corpus(self, batch: DataFrame, batch_id: int) -> DataFrame:
        # a replayed batch must not see its OWN previous output as history
        # (every doc would match itself at J=1.0 and be dropped)
        hist = self.corpus(exclude_batch=batch_id)
        if hist is None:
            return batch
        dup = D.jaccard_pairs_between(
            batch, hist, n=self.n, threshold=self.threshold,
            text_col=self.text_col, id_col=self.id_col,
        )
        # also drop exact duplicates of history (same fingerprint)
        fp_new = batch.select(
            F.col(self.id_col),
            D.fingerprint(F.col(self.text_col)).alias("_fp"),
        )
        fp_old = hist.select(D.fingerprint(F.col(self.text_col)).alias("_fp")).distinct()
        exact_dup_ids = fp_new.join(fp_old, "_fp", "left_semi").select(self.id_col)
        drop = dup.select(F.col("new_id").alias(self.id_col)).union(exact_dup_ids).distinct()
        return batch.join(drop, self.id_col, "left_anti")

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        admitted = self._dedup_against_corpus(self._dedup_within(batch), batch_id)
        out = os.path.join(self.corpus_dir, f"batch={batch_id}")
        tmp = out + "._tmp"
        if os.path.exists(tmp):  # stale staging dir from a crashed run
            shutil.rmtree(tmp)
        admitted.write.mode("overwrite").parquet(tmp)
        if os.path.exists(out):  # replayed batch: idempotent overwrite
            shutil.rmtree(out)
        os.rename(tmp, out)


def run_corpus_dedup_stream(
    docs_stream: DataFrame,
    hook: StreamingCorpusDedup,
    checkpoint_dir: str,
    available_now: bool = True,
    query_name: str = "lesw-corpus-dedup",
):
    """Wire a streaming documents DataFrame into the dedup hook."""
    writer = (
        docs_stream.writeStream.foreachBatch(hook.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
