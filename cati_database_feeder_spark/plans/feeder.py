"""Flagship plan: the reference feeder pipeline as ONE declarative query.

Reference shape (`RecruitsUploader.run()`, reference feeder.py:248-259 →
insert_data_into_database feeder.py:145-246): per-row anti-join against
already-loaded keys → reject filter → status CASE → date parse/format →
optional-column defaults → smallint clamp → varchar truncation → 40-col
projection → row-at-a-time INSERT.

Engine shape: the same semantics as one Catalyst plan over the star
schema (orders⋈customer stand in for the survey export, a key snapshot
stands in for the `recruits_log` phone scan — role mapping per
FIXTURES.md §B). Scale posture:

- the existing-keys side is a key-only projection, broadcast to the
  fact side (`F.broadcast`) → the dedup anti-join is shuffle-free, the
  direct fix for the reference's O(n·m) per-row list scan
  (feeder.py:157-160);
- the customer dimension join is also broadcast (dimensions ≪ facts);
- filters sit before the join so Catalyst pushes them into the scan;
- every computed column is a built-in expression → whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cati_database_feeder_spark.functions import scalar


def existing_keys_snapshot(orders: DataFrame) -> DataFrame:
    """Stand-in for `select phone from recruits_log where wave = N`
    (reference feeder.py:137-138): a deterministic subset of order keys
    pretending to be already loaded."""
    return orders.filter(F.col("o_orderkey") % 10 == 0).select("o_orderkey")


def feeder_pipeline(orders: DataFrame, customer: DataFrame,
                    existing: DataFrame, wave_number: int = 19,
                    blank_labels: bool = False) -> DataFrame:
    """The full transform chain, one declarative plan.

    Semantics per reference op (file:line cites into /root/reference):
      #15 reject filter       feeder.py:163-166  (status 'P' plays "Брак")
      #16 status CASE         feeder.py:168-171  ('F' complete, else interrupted)
      #17 anti-join dedup     feeder.py:157-160
      #18 wave literal        feeder.py:186
      #22-24 date parse/fmt   feeder.py:173-174
      #26 varchar truncation  feeder.py:205
      #27 smallint clamp      feeder.py:180-182
      #14 projection/rename   feeder.py:184-225

    ``blank_labels=True`` reproduces the wave-6 variant, which writes
    empty strings for every label column instead of the Excel values
    (feeder_w6.py:199-224).
    """
    interviews = (
        orders
        .filter(scalar.reject_predicate(F.col("o_orderstatus"), "P"))  # #15
        .join(F.broadcast(existing), on="o_orderkey", how="left_anti")  # #17
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner")
    )
    return interviews.select(
        F.col("o_orderkey").alias("id"),
        F.lit(wave_number).alias("wave"),                               # #18
        scalar.status_case(F.col("o_orderstatus"), complete_value="F",
                           complete_status="complete",
                           interrupted_status="interrupted").alias("status"),  # #16
        F.col("o_custkey").cast("string").alias("phone"),
        F.col("o_orderstatus").alias("result"),
        scalar.truncate_str(F.col("c_name"), 100).alias("name_rec"),    # #26
        scalar.clamp_smallint(F.round(F.col("o_totalprice") / 100).cast("int"))
              .alias("age_rec1"),                                       # #27
        (F.lit("") if blank_labels else F.col("c_mktsegment")).alias("q_region_label"),
        F.col("c_acctbal").alias("db_reward"),
        scalar.iso_date(F.col("o_orderdate")).alias("date"),            # #23
        scalar.iso_datetime(F.col("o_orderdate")).alias("recruited_at"),  # #24
    )


def feeder_skipped_report(orders: DataFrame, existing: DataFrame) -> DataFrame:
    """The reference's skipped-phones report (feeder.py:245-246) is the
    semi-join complement of the dedup anti-join."""
    return (orders.join(F.broadcast(existing), on="o_orderkey", how="left_semi")
                  .select("o_orderkey", "o_custkey"))
