"""Query registry: every judge-checkable operator as (Spark plan, DuckDB oracle).

Each entry in ``QUERIES`` is a callable ``(spark, sf_dir) -> DataFrame``;
``ORACLES`` holds the equivalent ANSI SQL for DuckDB over the same
parquet views. Names and aliases match exactly on both sides.

Determinism rules used throughout (so order-insensitive value hashes
match bit-for-bit):
- double aggregates: exact DECIMAL summation, final cast to DOUBLE —
  immune to partial-agg ordering (operators/aggregates.py:dsum);
- any LIMIT/top-k has a total deterministic ORDER BY (unique key
  tie-break);
- no raw nanosecond timestamps in outputs (Spark truncates parquet ns
  to µs, DuckDB keeps ns) — events.ts is bucketed or formatted.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cati_database_feeder_spark.catalog import load_table
from cati_database_feeder_spark.functions import scalar, text, vectors
from cati_database_feeder_spark.operators.aggregates import dsum, davg
from cati_database_feeder_spark.plans import feeder as feeder_plan

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# =====================================================================
# Feeder parity pack — SURVEY.md §2 ops #13-#33 (reference file:line in
# plans/feeder.py and functions/scalar.py docstrings)
# =====================================================================

@register("flagship_feeder", sql="""
WITH existing AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 0)
SELECT o.o_orderkey AS id,
       19 AS wave,
       CASE WHEN o.o_orderstatus = 'F' THEN 'complete' ELSE 'interrupted' END AS status,
       CAST(o.o_custkey AS VARCHAR) AS phone,
       o.o_orderstatus AS result,
       substr(c.c_name, 1, 100) AS name_rec,
       LEAST(CAST(round(o.o_totalprice / 100) AS INTEGER), 32767) AS age_rec1,
       c.c_mktsegment AS q_region_label,
       c.c_acctbal AS db_reward,
       strftime(o.o_orderdate, '%Y-%m-%d') AS date,
       strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS recruited_at
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus IS DISTINCT FROM 'P'
  AND NOT EXISTS (SELECT 1 FROM existing e WHERE e.o_orderkey = o.o_orderkey)
""")
def flagship_feeder(spark, sf_dir):
    """Ops #14-#18, #22-#24, #26-#27 as one plan (plans/feeder.py)."""
    orders = T(spark, sf_dir, "orders")
    customer = T(spark, sf_dir, "customer")
    existing = feeder_plan.existing_keys_snapshot(orders)
    return feeder_plan.feeder_pipeline(orders, customer, existing)


@register("feeder_skipped_report", sql="""
SELECT o.o_orderkey, o.o_custkey
FROM orders o
WHERE EXISTS (SELECT 1 FROM orders e WHERE e.o_orderkey % 10 = 0
              AND e.o_orderkey = o.o_orderkey)
""")
def feeder_skipped_report(spark, sf_dir):
    """Op #17 complement: semi-join skipped-rows report (feeder.py:245-246)."""
    orders = T(spark, sf_dir, "orders")
    return feeder_plan.feeder_skipped_report(
        orders, feeder_plan.existing_keys_snapshot(orders))


@register("scalar_functions", sql="""
SELECT o_orderkey AS id,
       lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0') AS month_padded,
       strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month_date,
       substr(o_orderpriority, 1, 1) AS priority_code,
       right(concat('wave_w', CAST(o_orderkey % 100 AS VARCHAR)), 2) AS wave_tail,
       COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'fallback') AS coalesced,
       LEAST(CAST(floor(o_totalprice) AS BIGINT), 32767) AS clamped
FROM orders
WHERE o_orderkey % 7 = 0
""")
def scalar_functions(spark, sf_dir):
    """Ops #20, #25, #27-#30 scalar pack (functions/scalar.py)."""
    orders = T(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("id"),
        scalar.zero_pad2(F.month("o_orderdate")).alias("month_padded"),
        scalar.iso_date(scalar.month_increment(F.col("o_orderdate"))).alias("next_month_date"),
        F.substring("o_orderpriority", 1, 1).alias("priority_code"),
        scalar.wave_from_project_name(
            F.concat(F.lit("wave_w"), (F.col("o_orderkey") % 100).cast("string"))
        ).alias("wave_tail"),
        F.coalesce(F.nullif("o_orderpriority", F.lit("1-URGENT")), F.lit("fallback")).alias("coalesced"),
        # floor before the int cast: Spark's double→int cast truncates
        # while DuckDB's rounds — floor() agrees everywhere.
        F.least(F.floor("o_totalprice").cast("bigint"), F.lit(32767).cast("bigint")).alias("clamped"),
    )


@register("month_surgery_faithful", sql="""
SELECT id, datestr,
       concat(substr(datestr, 1, 4), '-',
              lpad(CAST(CAST(substr(datestr, 6, 2) AS INTEGER) + 1 AS VARCHAR), 2, '0'),
              '-', substr(datestr, 9)) AS shifted
FROM (SELECT o_orderkey AS id,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS datestr
      FROM orders WHERE o_orderkey % 11 = 0)
""")
def month_surgery_faithful(spark, sf_dir):
    """Op #29 FAITHFUL mode: reference month-surgery bug preserved
    (December → "13", add_q5011_2t.py:85-100). Engine default is
    add_months; this query proves behavioral parity is available."""
    orders = T(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 11 == 0).select(
        F.col("o_orderkey").alias("id"),
        scalar.iso_datetime(F.col("o_orderdate")).alias("datestr"))
    return base.select("id", "datestr",
                       scalar.month_increment_faithful(F.col("datestr")).alias("shifted"))


@register("backfill_coalesce_repair", sql="""
WITH input AS (
  SELECT o_orderkey AS id,
         strftime(o_orderdate, '%d.%m.%Y %H:%M:%S') AS IVDate1,
         CASE WHEN o_orderkey % 3 = 0 THEN 'nan'
              ELSE strftime(o_orderdate + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S')
         END AS Q5011_2T
  FROM orders WHERE o_orderkey % 5 = 0
)
SELECT id, COALESCE(NULLIF(Q5011_2T, 'nan'),
                    strftime(strptime(IVDate1, '%d.%m.%Y %H:%M:%S'), '%Y-%m-%d %H:%M:%S')) AS q5011_2t
FROM input
""")
def backfill_coalesce_repair(spark, sf_dir):
    """Ops #22, #24, #30: the updater's coalesce path (add_q5011_2t.py:56-69)
    on a deterministically synthesized input batch."""
    orders = T(spark, sf_dir, "orders")
    inp = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_orderkey").alias("id"),
        F.date_format("o_orderdate", "dd.MM.yyyy HH:mm:ss").alias("IVDate1"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("nan"))
         .otherwise(scalar.iso_datetime(F.col("o_orderdate") + F.expr("INTERVAL 2 HOURS")))
         .alias("Q5011_2T"))
    iv_iso = scalar.iso_datetime(scalar.parse_ru_timestamp(F.col("IVDate1")))
    return inp.select(
        "id", scalar.coalesce_recruiting_date(F.col("Q5011_2T"), iv_iso).alias("q5011_2t"))


@register("limit_first_match", sql="""
SELECT o_orderkey AS id, o_totalprice
FROM orders
WHERE o_orderstatus = 'O'
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 1
""")
def limit_first_match(spark, sf_dir):
    """Ops #21/#32: first-match lookup as filter + deterministic
    ORDER BY + LIMIT 1 (reference does a linear scan, feeder.py:36-38)."""
    orders = T(spark, sf_dir, "orders")
    return (orders.filter(F.col("o_orderstatus") == "O")
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(1)
            .select(F.col("o_orderkey").alias("id"), "o_totalprice"))


@register("union_pages", sql="""
SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 100 < 3
UNION ALL
SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 100 BETWEEN 50 AND 52
""")
def union_pages(spark, sf_dir):
    """Op #4's page concatenation generalized: UNION ALL of two scans
    (reference: `projects += response["body"]`, feeder.py:34)."""
    orders = T(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 100 < 3).select("o_orderkey", "o_custkey")
    b = orders.filter((F.col("o_orderkey") % 100).between(50, 52)).select("o_orderkey", "o_custkey")
    return a.unionByName(b)
