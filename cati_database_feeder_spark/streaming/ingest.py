"""Streaming incremental corpus ingest — the composed production shape
of the incremental-dedup story as ONE operator.

Round 5/6 built the layers (streaming ingest dedup, delta-vs-corpus
near-dup, incremental component closure) and proved the composition in
tests/test_incremental_e2e.py; this wires them behind ``foreachBatch``
so a user points a document stream at a state directory and gets a
continuously-deduped corpus with a maintained near-dup labeling:

1. exact dedup — batch rows whose id already exists in the corpus are
   dropped (the streaming twin of the feeder's existing-keys anti-join,
   reference feeder.py:157-160), plus within-batch id dedup;
2. near-dup pairs — the surviving delta probes the MATERIALIZED banding
   store (operators/dedup.incremental_near_dup_pairs): corpus×corpus is
   never enumerated, per-batch cost is proportional to the batch;
3. closure update — new pairs fold into the stored labeling by graph
   contraction (operators/graph.incremental_components), equal to a
   full recompute by construction.

State lives in three parquet directories under ``state_dir`` — the
local stand-in for lakehouse tables, chosen so every maintenance write
is either APPEND-ONLY or an atomic directory swap:

- ``corpus/``  — (id, text), append-only;
- ``buckets/`` — the rep band-bucket banding table, append-only: after
  a batch commits, band rows for the delta-touching groups missing
  from the store are appended (dedup.delta_rep_buckets — the same
  expression the in-flight repair uses). Stale rows for superseded
  reps are left in place deliberately: they can only generate
  candidates that verification drops (a non-rep never joins the rep
  token frame), while every CURRENT rep is present by induction — a
  doc that is its group's minimum now was its group's minimum when it
  arrived, so its band rows were appended in its own batch;
- ``labels/``  — (id, component) closure labeling, replaced per batch
  via write-to-temp + atomic rename (never overwritten in place while
  a plan may still read it).

``foreachBatch`` is the right harness because each micro-batch runs
arbitrary BATCH DataFrame code with exactly-once-per-batch-id
semantics; the stateful operators (flatMapGroupsWithState et al.)
cannot express a multi-join pipeline against growing external state.
At 100 TB the parquet dirs become real tables and the append/swap
writes become MERGE/atomic-commit, with identical dataflow.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cati_database_feeder_spark.operators import dedup
from cati_database_feeder_spark.operators.graph import (
    connected_components, incremental_components)


def _swap_write(df: DataFrame, target: str) -> None:
    """Replace the parquet dir at ``target`` with ``df`` atomically-ish:
    write to a sibling temp dir, move the old dir aside, rename the new
    one in, THEN delete the old — the target is never absent longer
    than one rename, and a crash mid-swap leaves either the old or the
    new state readable. The writing plan may READ the old ``target``
    (the labels update does), so an in-place overwrite would corrupt
    its own input."""
    tmp = target.rstrip("/") + "__tmp"
    old = target.rstrip("/") + "__old"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(target):
        os.rename(target, old)
    os.rename(tmp, target)
    shutil.rmtree(old, ignore_errors=True)


def ingest_batch(spark, batch: DataFrame, state_dir: str,
                 id_col: str = "doc_id", text_col: str = "text",
                 threshold: float = 0.7, num_hashes: int = 16,
                 bands: int = 4) -> None:
    """Process one ingest batch against the state dir (see module
    docstring). Usable directly for batch backfills; ``foreachBatch``
    calls it per micro-batch."""
    corpus_dir = os.path.join(state_dir, "corpus")
    labels_dir = os.path.join(state_dir, "labels")
    buckets_dir = os.path.join(state_dir, "buckets")
    batch = (batch.select(F.col(id_col).alias("doc_id"),
                          F.col(text_col).alias("text"))
             .dropDuplicates(["doc_id"]))

    if not os.path.exists(corpus_dir):
        # bootstrap: the first batch IS the corpus snapshot. The corpus
        # write goes LAST as the commit marker: a retry of a partially
        # committed bootstrap (foreachBatch is at-least-once) must
        # re-enter THIS branch and redo labels/buckets — were corpus
        # written first, the retry would take the incremental path,
        # see an empty delta, and return with labels/buckets missing
        # forever.
        memb = dedup.tokset_groups(batch)
        pairs = dedup.near_dup_pairs(batch, threshold=threshold,
                                     num_hashes=num_hashes, bands=bands,
                                     groups=memb)
        labels = connected_components(
            pairs.select("id_a", "id_b"))
        _swap_write(labels, labels_dir)
        (dedup.rep_band_buckets(memb, num_hashes, bands)
         .write.mode("overwrite").parquet(buckets_dir))
        batch.write.mode("overwrite").parquet(corpus_dir)
        return

    corpus = spark.read.parquet(corpus_dir)
    delta = (batch.join(corpus.select("doc_id"), "doc_id", "left_anti")
             .persist())
    memb = None
    try:
        if delta.limit(1).count() == 0:
            return  # pure replay — nothing survives exact dedup
        buckets = spark.read.parquet(buckets_dir)
        labels = spark.read.parquet(labels_dir)
        # the membership stage is consumed by every downstream branch
        # (probe, verify, expansion, gnew) — persist it per batch. Its
        # build is ONE tokenize pass over corpus ∪ delta: the accepted
        # per-batch corpus-pass (the banding store already makes the
        # SIGNATURE pass batch-proportional; materializing membership
        # too is the next economization if a deployment needs it).
        memb = dedup.tokset_groups(corpus.unionByName(delta)).persist()
        new_pairs = dedup.incremental_near_dup_pairs(
            corpus, delta, threshold=threshold, num_hashes=num_hashes,
            bands=bands, groups=memb, buckets=buckets)
        new_labels = incremental_components(
            labels, new_pairs.select("id_a", "id_b"))

        # commit order: labels swap first (reads old labels — must
        # complete before anything changes), then the append-only stores
        _swap_write(new_labels, labels_dir)
        new_ids = delta.select(F.col("doc_id").alias("id"),
                               F.lit(True).alias("__new"))
        gnew = (memb.join(new_ids, "id", "left")
                .groupBy("gid")
                .agg(F.max(F.coalesce(F.col("__new"), F.lit(False)))
                      .alias("g"))
                .filter(F.col("g")).select("gid"))
        (dedup.delta_rep_buckets(memb, gnew, buckets, num_hashes, bands)
         .write.mode("append").parquet(buckets_dir))
        delta.write.mode("append").parquet(corpus_dir)
    finally:
        if memb is not None:
            memb.unpersist()
        delta.unpersist()


def compact_state(spark, state_dir: str, target_files: int | None = None,
                  prune_buckets: bool = True) -> None:
    """Maintenance for the append-only stores: every ingest batch adds
    one small parquet file to ``corpus/`` and ``buckets/``, and at
    production batch cadence the file count — not the byte count — is
    what degrades scan planning (per-file open cost, tiny row groups).
    Rewrites both stores into ``target_files`` balanced files via the
    same write-to-temp + rename swap the labels update uses. ``labels/``
    is swap-written whole each batch and never needs compaction.

    ``prune_buckets`` additionally drops banding rows whose id is no
    longer its group's representative (superseded when a smaller id
    joined the group): such rows are correctness-neutral — their
    candidates always fail the rep-only verification join — but they
    accumulate as pure probe/build overhead. Pruning costs one
    tokenize pass over the corpus (the rep set must be recomputed),
    which is the point of doing it HERE, amortized over many batches,
    instead of per ingest."""
    corpus_dir = os.path.join(state_dir, "corpus")
    buckets_dir = os.path.join(state_dir, "buckets")
    n = target_files or spark.sparkContext.defaultParallelism
    if os.path.exists(corpus_dir):
        _swap_write(spark.read.parquet(corpus_dir).repartition(n),
                    corpus_dir)
    if os.path.exists(buckets_dir):
        buckets = spark.read.parquet(buckets_dir)
        if prune_buckets and os.path.exists(corpus_dir):
            memb = dedup.tokset_groups(spark.read.parquet(corpus_dir))
            reps = (memb.filter(F.col("id") == F.col("gid"))
                    .select("id"))
            buckets = buckets.join(reps, "id", "left_semi")
        _swap_write(buckets.repartition(n), buckets_dir)


def start_incremental_ingest(stream: DataFrame, state_dir: str,
                             checkpoint_dir: str,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             threshold: float = 0.7,
                             num_hashes: int = 16, bands: int = 4,
                             available_now: bool = True):
    """Attach :func:`ingest_batch` to a document stream via
    ``foreachBatch`` and start it. Returns the StreamingQuery; state
    appears under ``state_dir`` (corpus/, labels/, buckets/)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(batch_df.sparkSession, batch_df, state_dir,
                     id_col=id_col, text_col=text_col,
                     threshold=threshold, num_hashes=num_hashes,
                     bands=bands)

    writer = (stream.writeStream.foreachBatch(_process)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("update"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
