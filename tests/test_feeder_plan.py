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
    # ISO formats (#23, #24)
    assert all(len(r["date"]) == 10 and len(r["recruited_at"]) == 19 for r in rows)


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
