"""Structured Streaming: run the real streaming operators over a file
stream of the events fixture and compare against their batch twins
(which are oracle-verified in queryset.py)."""

import shutil

import pytest
from pyspark.sql import functions as F

from cati_database_feeder_spark.catalog import load_table
from cati_database_feeder_spark.streaming import events as stream_ops


@pytest.fixture()
def event_stream(spark, sf_dir, tmp_path):
    """events.parquet rewritten as a µs-timestamp parquet dir so
    readStream can scan it with an explicit schema."""
    src = load_table(spark, sf_dir, "events")
    data_dir = str(tmp_path / "stream_in")
    src.write.parquet(data_dir)
    schema = src.schema
    return spark.readStream.schema(schema).parquet(data_dir), src, tmp_path


def _run_to_completion(stream_df, tmp_path, mode="append"):
    q = (stream_df.writeStream.format("memory").queryName("t_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    spark = stream_df.sparkSession
    out = spark.table("t_out").collect()
    q.stop()
    shutil.rmtree(str(tmp_path / "ckpt"), ignore_errors=True)
    return out


def test_tumbling_window_stream_matches_batch(event_stream):
    stream, batch, tmp = event_stream
    got = _run_to_completion(stream_ops.tumbling_window_counts(stream), tmp)
    want = (batch.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events")).collect())
    got_map = {(r["window_start"], r["event_type"]): r["n_events"] for r in got}
    want_map = {(r["w"]["start"], r["event_type"]): r["n_events"] for r in want}
    # Streaming semantics, not a bug: rows later than the watermark are
    # dropped and a handful of unordered input files can make a window
    # under-count — every emitted window must still be ≤ its batch twin,
    # and coverage must be near-total.
    assert set(got_map) <= set(want_map)
    assert all(got_map[k] <= want_map[k] for k in got_map)
    exact = sum(1 for k in got_map if got_map[k] == want_map[k])
    assert exact / len(want_map) > 0.95


def test_session_window_stream_runs(event_stream):
    stream, batch, tmp = event_stream
    got = _run_to_completion(stream_ops.session_window_stats(stream, gap="6 hours"), tmp)
    assert len(got) > 0
    assert all(r["n_events"] >= 1 for r in got)


def test_dedup_within_watermark(event_stream, spark):
    stream, batch, tmp = event_stream
    got = _run_to_completion(stream_ops.deduped_stream(stream), tmp)
    # event_id is unique in the fixture: dedup must be lossless
    assert len(got) == batch.count()


def test_stateful_running_counts(event_stream):
    stream, batch, tmp = event_stream
    got = _run_to_completion(stream_ops.stateful_running_counts(stream), tmp,
                             mode="update")
    # final running count per user (last update wins) must equal the
    # batch per-user count; totals likewise
    final = {}
    for r in got:
        prev = final.get(r["user_id"])
        if prev is None or r["n_events"] >= prev["n_events"]:
            final[r["user_id"]] = r
    want = {r["user_id"]: r for r in
            batch.groupBy("user_id")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum("value").alias("tot")).collect()}
    assert set(final) == set(want)
    assert all(final[u]["n_events"] == want[u]["n"] for u in want)
    assert all(abs(final[u]["value_total"] - float(want[u]["tot"])) < 1e-6
               for u in want)


def test_foreach_batch_upsert_sink(event_stream):
    stream, batch, tmp = event_stream
    seen = {}

    def upsert(batch_df, batch_id):
        for r in batch_df.groupBy("event_type").count().collect():
            seen[r["event_type"]] = seen.get(r["event_type"], 0) + r["count"]

    q = (stream.writeStream.foreachBatch(upsert)
         .option("checkpointLocation", str(tmp / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    q.stop()
    want = {r["event_type"]: r["count"] for r in batch.groupBy("event_type").count().collect()}
    assert seen == want


def test_stream_static_enrichment_join(event_stream, spark):
    stream_df, batch_src, tmp_path = event_stream
    dim = spark.createDataFrame(
        [(i, f"segment-{i % 3}") for i in range(200)], ["user_id", "segment"])
    enriched = stream_ops.enrich_with_dimension(stream_df, dim, on="user_id")
    got = _run_to_completion(
        enriched.groupBy("segment").agg(F.count(F.lit(1)).alias("n")),
        tmp_path, mode="complete")
    # batch twin over the same inputs
    want = {r["segment"]: r["n"] for r in
            batch_src.join(F.broadcast(dim), "user_id", "left")
            .groupBy("segment").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert {r["segment"]: r["n"] for r in got} == want
    assert sum(want.values()) == batch_src.count()


def test_stream_stream_interval_join_matches_batch(event_stream, spark):
    stream_df, batch_src, tmp_path = event_stream
    views_s = stream_df.filter(F.col("event_type") == "view")
    purch_s = stream_df.filter(F.col("event_type") == "purchase")
    joined = stream_ops.stream_stream_conversion_join(views_s, purch_s)
    got = sorted((r["user_id"], r["view_ts"], r["purchase_ts"])
                 for r in _run_to_completion(joined, tmp_path))

    v = batch_src.filter(F.col("event_type") == "view") \
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts"))
    p = batch_src.filter(F.col("event_type") == "purchase") \
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"))
    want = sorted((r["v_user"], r["view_ts"], r["purchase_ts"]) for r in
                  v.join(p, (F.col("v_user") == F.col("p_user"))
                         & (F.col("purchase_ts") >= F.col("view_ts"))
                         & (F.col("purchase_ts") <= F.col("view_ts")
                            + F.expr("INTERVAL 24 hours"))).collect())
    assert got == want
    assert len(got) > 0


def test_ingest_dedup_against_corpus_matches_batch_anti_join(event_stream, spark):
    """Stream-static left_anti dedup must drop exactly the rows whose
    key is in the corpus snapshot — bit-identical to the batch anti-join
    twin (the feeder's #17), with no join state carried across batches."""
    stream, batch, tmp = event_stream
    corpus = batch.filter(F.col("event_id") % 10 == 0).select("event_id")
    got = _run_to_completion(
        stream_ops.ingest_dedup_against_corpus(stream, corpus), tmp)
    want = batch.join(corpus, "event_id", "left_anti")
    assert len(got) == want.count()
    assert all(r["event_id"] % 10 != 0 for r in got)


def test_sessionize_batch_equals_session_window_twin(spark, sf_dir):
    """E68 ↔ §2.8 twin contract: the batch gap-sessionization must
    partition events exactly like Spark's own session_window run over
    the same batch (same gap). session_window merges on a strict
    within-gap rule and sessionize breaks on a strict beyond-gap rule
    — identical groupings unless a gap equals the threshold to the
    microsecond, which the sub-second fixture cannot produce. Matched
    on (user, formatted session start, event count)."""
    from cati_database_feeder_spark.catalog import load_table
    from cati_database_feeder_spark.operators.windows import sessionize
    events = load_table(spark, sf_dir, "events")
    mine = {(r["user_id"], r["session_start"], r["n_events"])
            for r in sessionize(events, gap_sec=21600).collect()}
    twin = {(r["user_id"], r["session_start"], r["n_events"])
            for r in (events
                      .groupBy(F.session_window("ts", "6 hours")
                               .alias("w"), "user_id")
                      .agg(F.count(F.lit(1)).alias("n_events"))
                      .select("user_id",
                              F.date_format("w.start",
                                            "yyyy-MM-dd HH:mm:ss")
                              .alias("session_start"), "n_events")
                      .collect())}
    assert mine == twin and len(mine) > 0
