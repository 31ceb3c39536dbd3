"""End-to-end incremental-ingest pipeline: file stream → streaming
ingest dedup → incremental near-dup pairs → incremental component
closure, asserted equal to a from-scratch batch recompute.

Round 5 verified each layer piecewise (streaming anti-join vs its batch
twin, incremental pairs vs restricted full pairs, incremental closure
vs full closure); this test pins the COMPOSED contract — the
snapshot/labeling handoff between layers:

- the corpus key snapshot the stream dedups against is the same corpus
  the pair delta probes,
- the banding table is a STALE per-corpus-snapshot materialization
  (production shape; exercises the auto-repair for delta groups),
- the base labeling handed to incremental_components is exactly what
  connected_components emitted for the prior corpus.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from cati_database_feeder_spark.catalog import load_table
from cati_database_feeder_spark.operators import dedup
from cati_database_feeder_spark.operators.graph import (
    connected_components, incremental_components)
from cati_database_feeder_spark.streaming import events as stream_ops


def test_stream_ingest_to_incremental_closure_equals_full_recompute(
        spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    # the incoming batch: every delta doc PLUS replays of corpus docs —
    # the replays must die at the streaming dedup, nothing downstream
    # may ever see them
    incoming = docs.filter((F.col("doc_id") % 10 == 0)
                           | (F.col("doc_id") % 7 == 0))

    # ---- layer 1: stream the batch in, dedup against the corpus keys
    data_dir = str(tmp_path / "ingest_in")
    incoming.write.parquet(data_dir)
    stream = spark.readStream.schema(incoming.schema).parquet(data_dir)
    q = (stream_ops.ingest_dedup_against_corpus(
            stream, corpus.select("doc_id"), on="doc_id")
         .writeStream.format("memory").queryName("ingested")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    survivors = spark.table("ingested").select("doc_id", "text")
    q.stop()
    shutil.rmtree(str(tmp_path / "ckpt"), ignore_errors=True)
    n_surv = survivors.count()
    # exactly the true delta survived (replayed corpus ids dropped)
    assert n_surv == docs.filter(F.col("doc_id") % 10 == 0).count()
    delta = spark.createDataFrame(survivors.collect(), survivors.schema)

    # ---- layer 2: near-dup pairs of the surviving batch vs the corpus,
    # probing the corpus-snapshot banding table (stale w.r.t. the delta)
    memb = dedup.tokset_groups(corpus.unionByName(delta))
    stale_buckets = dedup.rep_band_buckets(dedup.tokset_groups(corpus))
    new_pairs = dedup.incremental_near_dup_pairs(
        corpus, delta, threshold=0.7, groups=memb, buckets=stale_buckets)

    # ---- layer 3: fold the new pairs into the prior corpus labeling
    base_labels = connected_components(
        dedup.near_dup_pairs(corpus, threshold=0.7))
    got = {(r["id"], r["component"]) for r in
           incremental_components(base_labels, new_pairs).collect()}

    # ---- the whole pipeline equals a from-scratch recompute
    want = {(r["id"], r["component"]) for r in
            connected_components(
                dedup.near_dup_pairs(corpus.unionByName(delta),
                                     threshold=0.7)).collect()}
    # node sets coincide: base labels = corpus-pair endpoints,
    # singletons = new-edge endpoints, and the full run's endpoints are
    # exactly their union (corpus-internal pairs are corpus-deterministic)
    assert len(want) > 0
    assert got == want


def test_ingest_batch_api_with_compaction(spark, tmp_path):
    """The batch-level API (ingest_batch) + compact_state: three
    batches where batch 2 supersedes an existing group's rep (doc 1
    duplicates doc 10's text with a smaller id), compaction between
    batches prunes the stale rep's banding rows and rewrites the
    small-file stores, and the final labeling still equals a full
    recompute."""
    from cati_database_feeder_spark.streaming.ingest import (
        compact_state, ingest_batch)

    rows = [
        (10, "alpha beta gamma delta"),
        (11, "alpha beta gamma delta epsilon"),
        (40, "foo bar baz qux"),
        (1, "delta gamma beta alpha"),     # batch 2: same set as 10 -> new rep
        (41, "foo bar baz qux quux"),
        (70, "completely different text entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    state = str(tmp_path / "state")
    ingest_batch(spark, df.filter(F.col("doc_id").isin(10, 11, 40)), state)
    ingest_batch(spark, df.filter(F.col("doc_id").isin(1, 41)), state)

    buckets_dir = os.path.join(state, "buckets")
    before = spark.read.parquet(buckets_dir)
    # doc 10's rows are now stale (doc 1 is the group's rep)
    assert before.filter(F.col("id") == 10).count() > 0
    compact_state(spark, state, target_files=2)
    after = spark.read.parquet(buckets_dir)
    assert after.filter(F.col("id") == 10).count() == 0
    assert after.filter(F.col("id") == 1).count() > 0

    ingest_batch(spark, df.filter(F.col("doc_id") == 70), state)
    got = {(r["id"], r["component"]) for r in
           spark.read.parquet(os.path.join(state, "labels")).collect()}
    want = {(r["id"], r["component"]) for r in
            connected_components(
                dedup.near_dup_pairs(df, threshold=0.7)
                .select("id_a", "id_b")).collect()}
    assert len(want) > 0
    assert got == want


def test_ingest_batch_retry_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: redelivering a batch — including
    a bootstrap retried from a partial commit where corpus/ (the commit
    marker, written last) is missing — must leave the state byte-stable:
    the labels relabel is a fixed point, the buckets append finds
    nothing missing, the corpus anti-join drops everything."""
    import shutil as sh

    from cati_database_feeder_spark.streaming.ingest import ingest_batch

    rows = [(10, "alpha beta gamma delta"), (11, "alpha beta gamma delta x"),
            (40, "foo bar baz qux"), (41, "foo bar baz qux quux")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    b1 = df.filter(F.col("doc_id") < 40)
    b2 = df.filter(F.col("doc_id") >= 40)
    state = str(tmp_path / "state")

    def snapshot():
        lab = {(r["id"], r["component"]) for r in
               spark.read.parquet(os.path.join(state, "labels")).collect()}
        cor = sorted(r["doc_id"] for r in
                     spark.read.parquet(os.path.join(state, "corpus")).collect())
        bkt = sorted((r["id"], r["band"], r["bucket"]) for r in
                     spark.read.parquet(os.path.join(state, "buckets")).collect())
        return lab, cor, bkt

    ingest_batch(spark, b1, state)
    # crash-retry of the bootstrap: corpus/ (written last) missing,
    # labels/ and buckets/ already committed → must re-bootstrap fully
    s1 = snapshot()
    sh.rmtree(os.path.join(state, "corpus"))
    ingest_batch(spark, b1, state)
    assert snapshot() == s1
    # straight redelivery of a completed bootstrap batch
    ingest_batch(spark, b1, state)
    assert snapshot() == s1

    ingest_batch(spark, b2, state)
    s2 = snapshot()
    assert s2 != s1
    # redelivery of a completed incremental batch
    ingest_batch(spark, b2, state)
    assert snapshot() == s2


def test_start_incremental_ingest_multi_batch_equals_full_recompute(
        spark, sf_dir, tmp_path):
    """The packaged operator (streaming/ingest.start_incremental_ingest)
    fed three micro-batches — bootstrap, a batch carrying replayed ids,
    a final batch — must leave a state dir whose corpus is exactly the
    distinct doc set and whose labeling equals a from-scratch closure
    over the whole corpus. maxFilesPerTrigger=1 forces one batch per
    appended file, so the append-only buckets store and the label swap
    are exercised across real batch boundaries."""
    from cati_database_feeder_spark.streaming.ingest import (
        start_incremental_ingest)

    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 2 == 0)      # 250 docs — keep it quick
            .select("doc_id", "text"))
    p0 = docs.filter(F.col("doc_id") % 3 == 0)
    p1 = docs.filter(F.col("doc_id") % 3 == 1)
    p2 = docs.filter(F.col("doc_id") % 3 == 2)
    stream_dir = str(tmp_path / "stream_in")
    p0.coalesce(1).write.mode("append").parquet(stream_dir)
    # batch 2 replays a slice of batch 1's ids — exact dedup must drop them
    p1.unionByName(p0.limit(20)).coalesce(1).write.mode("append").parquet(stream_dir)
    p2.coalesce(1).write.mode("append").parquet(stream_dir)

    state_dir = str(tmp_path / "state")
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(stream_dir))
    q = start_incremental_ingest(stream, state_dir,
                                 str(tmp_path / "ingest_ckpt"))
    q.awaitTermination(300)
    q.stop()

    corpus = spark.read.parquet(os.path.join(state_dir, "corpus"))
    assert corpus.count() == docs.count()
    assert corpus.select("doc_id").subtract(docs.select("doc_id")).count() == 0

    got = {(r["id"], r["component"]) for r in
           spark.read.parquet(os.path.join(state_dir, "labels")).collect()}
    want = {(r["id"], r["component"]) for r in
            connected_components(
                dedup.near_dup_pairs(docs, threshold=0.7)
                .select("id_a", "id_b")).collect()}
    assert len(want) > 0
    assert got == want
