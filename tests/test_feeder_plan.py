"""End-to-end tests of the flagship feeder plan on sf0.001 + plan-shape
assertions (broadcast anti-join, pushed filters) — the scale posture is
part of the contract, not just the row values."""

from pyspark.sql import functions as F

from cati_database_feeder_spark.catalog import load_table
from cati_database_feeder_spark.plans import feeder


def test_flagship_no_rejects_no_existing(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    existing = feeder.existing_keys_snapshot(orders)
    out = feeder.feeder_pipeline(orders, customer, existing)

    rows = out.collect()
    assert len(rows) > 0
    # no rejected status survived (#15)
    assert all(r["result"] != "P" for r in rows)
    # dedup really removed every existing key (#17)
    assert all(r["id"] % 10 != 0 for r in rows)
    # status CASE (#16)
    assert all((r["status"] == "complete") == (r["result"] == "F") for r in rows)
    # smallint clamp (#27)
    assert all(r["age_rec1"] <= 32767 for r in rows)
    # ISO date via the IVDate1 string round-trip (#22-#23)
    assert all(len(r["date"]) == 10 for r in rows)
    # full reference width (#14, feeder.py:184-225): all 40 columns
    assert len(out.columns) == 40
    # optional columns absent from the export surface as typed NULLs (#19)
    assert all(r["db_rew"] is None and r["reward"] is None for r in rows)


def test_flagship_plan_shape(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    out = feeder.feeder_pipeline(orders, customer,
                                 feeder.existing_keys_snapshot(orders))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both the existing-keys anti-join and the customer dim join must be
    # broadcast — no shuffle of the fact side for dedup or dim lookup
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    # the reject filter must be pushed into the parquet scan
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    assert "PushedFilters" in out._jdf.queryExecution().executedPlan().toString() or "Filter" in optimized


def test_skipped_report_partitions_existing(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    existing = feeder.existing_keys_snapshot(orders)
    skipped = feeder.feeder_skipped_report(orders, existing)
    assert skipped.count() == existing.count()


def test_backfill_month_repair_per_file(spark):
    """Op #33 (reference add_q5011_2t.py:27-45, 56-69): the shift flag
    is peeked per file — IVDate1 from the literal first row, month from
    the first non-null Q5011_2T — and repair skips NULL/"nan" rows."""
    from cati_database_feeder_spark.plans.backfill import backfill_recruiting_date

    rows = [
        # file A: shifted (first row iv month 03 vs first non-null rec month 04)
        (1, "A", "05.03.2022 10:00:00", "nan"),
        (2, "A", "06.03.2022 11:00:00", "2022-04-06 11:30:00"),
        (3, "A", "07.03.2022 12:00:00", "2022-04-07 12:30:00"),
        # file B: consistent (iv month 05 == rec month 05)
        (4, "B", "01.05.2022 09:00:00", "2022-05-01 09:30:00"),
        (5, "B", "02.05.2022 09:00:00", "nan"),
    ]
    df = spark.createDataFrame(rows, ["id", "file_id", "IVDate1", "Q5011_2T"])
    out = {r["id"]: r["q5011_2t"]
           for r in backfill_recruiting_date(df, file_col="file_id").collect()}
    assert out[1] == "2022-03-05 10:00:00"   # nan -> IVDate1, NOT repaired
    assert out[2] == "2022-05-06 11:30:00"   # shifted file: +1 month
    assert out[3] == "2022-05-07 12:30:00"
    assert out[4] == "2022-05-01 09:30:00"   # consistent file: untouched
    assert out[5] == "2022-05-02 09:00:00"   # nan -> IVDate1


def test_backfill_faithful_december_bug(spark):
    """Faithful mode preserves the reference's no-rollover bug
    (add_q5011_2t.py:96-100): December repairs to month "13"."""
    from cati_database_feeder_spark.plans.backfill import backfill_recruiting_date

    rows = [
        (1, "11.12.2022 10:00:00", "2023-01-11 10:30:00"),
        (2, "12.12.2022 10:00:00", "2022-12-12 10:30:00"),
    ]
    df = spark.createDataFrame(rows, ["id", "IVDate1", "Q5011_2T"])
    out = {r["id"]: r["q5011_2t"]
           for r in backfill_recruiting_date(df, faithful=True).collect()}
    assert out[1] == "2023-02-11 10:30:00"
    assert out[2] == "2022-13-12 10:30:00"  # the reference bug, on purpose


def test_asof_join_backward_semantics(spark):
    """Backward as-of: <= matches (equal ts included), ties toward the
    larger tie column, no prior right row -> NULL carries."""
    from cati_database_feeder_spark.operators.joins import asof_join_backward

    left = spark.createDataFrame(
        [(1, 100, 10), (1, 101, 20), (2, 200, 5), (3, 300, 7)],
        ["k", "eid", "t"])
    right = spark.createDataFrame(
        [(101, 1, 10, 1.0),   # equal ts as left eid=100 -> matches it
         (102, 1, 10, 2.0),   # same ts, larger eid wins the tie
         (103, 1, 15, 3.0),   # between the two left rows
         (104, 2, 6, 4.0)],   # AFTER left (2,5): no match for it
        ["eid", "k", "t", "value"])
    out = {r["eid"]: r for r in asof_join_backward(
        left, right.select("k", "eid", "t", "value"),
        on="k", ts_col="t", tie_col="eid",
        carry_cols=["eid", "value"]).collect()}
    assert out[100]["asof_eid"] == 102 and out[100]["asof_value"] == 2.0
    assert out[101]["asof_eid"] == 103 and out[101]["asof_value"] == 3.0
    assert out[200]["asof_eid"] is None      # right row is in the future
    assert out[300]["asof_eid"] is None      # no right rows for key 3


def test_bloom_runtime_filter_plan_and_scope(spark):
    """E155 plan pin: with the demo's confs, the SMJ fact side carries
    bloom_might_contain fed by a bloom_filter_agg over the FILTERED
    dim keys — and the conf scope restores afterwards (a leaked -1
    broadcast threshold would degrade the whole shared session)."""
    from cati_database_feeder_spark import queryset
    from cati_database_feeder_spark.queryset import (
        _BLOOM_CONFS, _bloom_join_frames)
    import pyspark.sql.functions as F

    before = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    out = queryset.QUERIES["join_bloom_runtime_filter"](
        spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 1 and out[0]["o_orderpriority"] == "1-URGENT"
    assert out[0]["n_lines"] > 0
    after = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    assert after == before

    # plan shape under the demo confs (re-created here because the
    # registered query materializes inside its scope)
    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        l, o = _bloom_join_frames(spark, "/root/testdata/sf0.001")
        j = (l.join(o, l.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_asof_join_tolerance_semantics(spark):
    """Tolerance null-out: a match inside the window carries; an older
    match nulls ALL carries together (as if absent); no-match rows
    stay NULL; the carried ts at exactly the tolerance edge still
    matches (<=)."""
    from cati_database_feeder_spark.operators.joins import (
        asof_join_backward)

    left = spark.createDataFrame(
        [(1, 100, 50), (1, 101, 200), (2, 200, 30), (3, 300, 10)],
        ["k", "eid", "t"])
    right = spark.createDataFrame(
        [(11, 1, 40, 1.0),    # 10 ticks before left eid=100 -> inside
         (12, 2, 5, 2.0)],    # 25 ticks before left eid=200 -> stale
        ["eid", "k", "t", "value"])
    out = {r["eid"]: r for r in asof_join_backward(
        left, right.select("k", "eid", "t", "value"),
        on="k", ts_col="t", tie_col="eid",
        carry_cols=["eid", "t", "value"], tolerance_us=10).collect()}
    assert out[100]["asof_eid"] == 11 and out[100]["asof_value"] == 1.0
    assert out[100]["asof_t"] == 40          # exactly at tolerance: kept
    assert out[101]["asof_eid"] is None      # 160 stale: all carries null
    assert out[101]["asof_t"] is None and out[101]["asof_value"] is None
    assert out[200]["asof_eid"] is None      # 25 > 10: stale
    assert out[300]["asof_eid"] is None      # no right rows at all
