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

- the existing-keys side is a key-only projection; whether it is
  broadcast (shuffle-free anti-join — the direct fix for the
  reference's O(n·m) per-row list scan, feeder.py:157-160) or
  shuffled is AQE's runtime call by measured size. The reference's
  key set is per-wave and bounded (feeder.py:127-143 reads one wave),
  so broadcast is usually what AQE picks — but this stand-in snapshot
  scales with orders, and a FORCED broadcast hint is honored
  regardless of size, which is an executor-OOM at 100 TB. No hints on
  fact-derived frames;
- same posture for the customer join: customer scales with the data
  (sf×150k rows), so its strategy is AQE's call too — broadcast under
  the threshold locally, sort-merge at scale;
- filters sit before the join so Catalyst pushes them into the scan;
- every computed column is a built-in expression → whole-stage codegen.

Perf attribution (round 5, warm noop-write at sf0.1, local[32]): the
full pipeline is 0.64 s, of which the synthesized 40-column export
surface (survey_export_frame — ~15 concat + date_format string builds
per row) is 0.63 s and the anti-join + downstream transform add
< 0.02 s; the bare orders⋈customer join is 0.16 s. The 2× move vs the
round-1 bench number is the round-2 widening from an 11-column to the
reference's full 40-column projection (feeder.py:184-225) — i.e. the
parity tax of building the export strings at all, not a plan defect:
the string work is inside one WholeStageCodegen over the scan, there
is no extra shuffle or Python. Irreducible short of faking narrower
output.
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


def survey_export_frame(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Synthesize the reference's Excel export schema (the column set
    ``insert_data_into_database`` reads, feeder.py:184-225) from the
    star tables — including the dotted ``Q3.1``-style headers that need
    backtick quoting in Spark. ``DB_Rew`` and ``Reward`` are deliberately
    ABSENT so the optional-column path (#19, feeder.py:176-178) runs."""
    j = orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
    k, ck = F.col("o_orderkey"), F.col("o_custkey")
    s = lambda c: c.cast("string")
    return j.select(
        k.alias("ID"),
        ck.cast("string").alias("Phone"),
        F.col("o_orderstatus").alias("Result"),
        F.date_format("o_orderdate", scalar.RU_TS_FORMAT).alias("IVDate1"),
        F.concat(F.lit("ext-"), s(k)).alias("ExtID"),
        F.col("c_mktsegment").alias("DB_RegionName"),
        F.col("o_orderpriority").alias("DB_OperatorName"),
        (k % 89).alias("DB_Region"),
        (ck % 7).alias("DB_Operator"),
        F.lit("09:00").alias("DB_CallIntervalBegin"),
        F.lit("21:00").alias("DB_CallIntervalEnd"),
        ((k % 12) - 3).alias("DB_TimeDifference"),
        F.substring("c_name", 1, 12).alias("Q3_label"),
        (k % 5).alias("Q3.1"),
        F.concat(F.lit("q31-"), s(k % 5)).alias("Q3.1_label"),
        (k % 3).alias("Q3.2"),
        F.concat(F.lit("q32-"), s(k % 3)).alias("Q3.2_label"),
        ((k % 2) + 1).alias("S_SEX"),
        F.when((k % 2) + 1 == 1, "male").otherwise("female").alias("S_SEX_label"),
        F.col("c_name").alias("Q2"),
        F.round(F.col("o_totalprice") / 100).cast("int").alias("AGE"),
        F.concat(F.lit("age-"), s(k % 6)).alias("S_AGE_label"),
        (k % 4).alias("Q9.1"),
        (ck % 10).alias("Q10"),
        (k % 11).alias("Q11"),
        F.concat(F.lit("q11-"), s(k % 11)).alias("Q11_label"),
        F.concat(F.lit("t-"), s(ck % 13)).alias("Q11_8T"),
        (k % 83).alias("QREGION"),
        F.col("c_mktsegment").alias("QREGION_label"),
        (ck % 4).alias("Q4"),
        F.concat(F.lit("op-"), s(ck % 4)).alias("Q4_label"),
        F.col("c_acctbal").alias("DB_Reward"),
        F.concat(F.lit("city-"), s(F.col("c_nationkey"))).alias("d2006_label"),
        F.concat(F.lit("edu-"), s(k % 3)).alias("d2003_label"),
        F.concat(F.lit("job-"), s(ck % 5)).alias("d2005_label"),
        F.concat(F.lit("inc-"), s(k % 7)).alias("q84_label"),
    )


def feeder_pipeline(orders: DataFrame, customer: DataFrame,
                    existing: DataFrame, wave_number: int = 19,
                    blank_labels: bool = False) -> DataFrame:
    """The full transform chain, one declarative plan, at the reference's
    full 40-column width (feeder.py:184-225 query_parameters dict).

    Semantics per reference op (file:line cites into /root/reference):
      #15 reject filter       feeder.py:163-166  (status 'P' plays "Брак")
      #16 status CASE         feeder.py:168-171  ('F' complete, else interrupted)
      #17 anti-join dedup     feeder.py:157-160
      #18 wave literal        feeder.py:186
      #19 optional columns    feeder.py:176-178  (DB_Reward/DB_Rew/Reward row.get)
      #22-23 date parse/fmt   feeder.py:173-174  (IVDate1 string → ISO date)
      #26 varchar truncation  feeder.py:205
      #27 smallint clamp      feeder.py:180-182
      #14 projection/rename   feeder.py:184-225  (all 40 output columns,
                              incl. dotted `Q3.1` headers backtick-quoted)

    ``blank_labels=True`` reproduces the wave-6 variant, which writes
    empty strings for the 12 label columns instead of the Excel values
    (feeder_w6.py:198-225).
    """
    survey = survey_export_frame(orders, customer)
    base = (
        survey
        .join(existing.withColumnRenamed("o_orderkey", "ID"),
              on="ID", how="left_anti")                                 # #17
        .filter(scalar.reject_predicate(F.col("Result"), "P"))          # #15
    )
    lab = (lambda c: F.lit("")) if blank_labels else (lambda c: c)
    q = lambda name: F.col(f"`{name}`")
    return base.select(
        F.col("ID").alias("id"),
        F.lit(wave_number).alias("wave"),                               # #18
        scalar.status_case(F.col("Result"), complete_value="F",
                           complete_status="complete",
                           interrupted_status="interrupted").alias("status"),  # #16
        F.col("Phone").alias("phone"),
        F.col("Result").alias("result"),
        F.col("ExtID").alias("ext_id"),
        F.col("DB_RegionName").alias("region_name"),
        F.col("DB_OperatorName").alias("operator_name"),
        F.col("DB_Region").alias("region"),
        F.col("DB_Operator").alias("operator"),
        F.col("DB_CallIntervalBegin").alias("call_interval_begin"),
        F.col("DB_CallIntervalEnd").alias("call_interval_end"),
        F.col("DB_TimeDifference").alias("time_difference"),
        lab(F.col("Q3_label")).alias("q3_label"),
        q("Q3.1").alias("q3_1"),
        lab(q("Q3.1_label")).alias("q3_1_label"),
        q("Q3.2").alias("q3_2"),
        lab(q("Q3.2_label")).alias("q3_2_label"),
        F.col("S_SEX").alias("s_sex"),
        lab(F.col("S_SEX_label")).alias("s_sex_label"),
        scalar.truncate_str(F.col("Q2"), 100).alias("name_rec"),        # #26
        scalar.clamp_smallint(F.col("AGE")).alias("age_rec1"),          # #27
        lab(F.col("S_AGE_label")).alias("age_rec2"),
        q("Q9.1").alias("q9_1"),
        F.col("Q10").alias("q10"),
        F.col("Q11").alias("q11"),
        lab(F.col("Q11_label")).alias("q11_label"),
        F.col("Q11_8T").alias("q11_8t"),
        F.col("QREGION").alias("q_region"),
        lab(F.col("QREGION_label")).alias("q_region_label"),
        F.col("Q4").alias("q_oper_code"),
        lab(F.col("Q4_label")).alias("q_oper_name"),
        scalar.optional_column(survey.columns, "DB_Reward").alias("db_reward"),  # #19
        scalar.optional_column(survey.columns, "DB_Rew").alias("db_rew"),
        scalar.optional_column(survey.columns, "Reward").alias("reward"),
        lab(F.col("d2006_label")).alias("q_city"),
        lab(F.col("d2003_label")).alias("q_obrazovanie"),
        lab(F.col("d2005_label")).alias("q_rabota"),
        lab(F.col("q84_label")).alias("q_dohod"),
        scalar.iso_date(scalar.parse_ru_timestamp(F.col("IVDate1"))).alias("date"),  # #22-23
    )


def feeder_skipped_report(orders: DataFrame, existing: DataFrame) -> DataFrame:
    """The reference's skipped-phones report (feeder.py:245-246) is the
    semi-join complement of the dedup anti-join. Like the anti-join, the
    existing side is fact-derived, so broadcast-vs-shuffle is AQE's
    runtime decision, not a forced hint."""
    return (orders.join(existing, on="o_orderkey", how="left_semi")
                  .select("o_orderkey", "o_custkey"))
