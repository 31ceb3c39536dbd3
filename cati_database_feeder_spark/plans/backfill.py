"""Backfill/repair plans — the updater jobs re-expressed declaratively.

Reference: `Q5011_2TUpdater.run_excel()` (add_q5011_2t.py:111-116) reads
one Excel file at a time, peeks at the first row to decide whether the
whole file's months are shifted (add_q5011_2t.py:27-45), then per-row
coalesces Q5011_2T with a reformatted IVDate1 and UPDATEs by id.

Engine shape: multi-file scan with `input_file_name()` grouping, the
per-file month-consistency flag as a window aggregate (no driver loop,
no first-row peek — `first()` over a per-file window), repair as a
conditional `add_months`, and the keyed UPDATE as a staging MERGE
(sinks/jdbc.py). Scales to any number of files: per-file logic is a
window over the file column, not a Python loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cati_database_feeder_spark.functions import scalar


def month_mismatch_flag(ivdate_ts: Column, recruiting_date: Column) -> Column:
    """Op #33 (add_q5011_2t.py:27-45): true when the interview month
    differs from the recruiting-date month (string positions 6-7 of an
    ISO date, as the reference slices it at add_q5011_2t.py:37)."""
    iv_month = F.date_format(ivdate_ts, "MM")
    rec_month = F.substring(recruiting_date, 6, 2)
    return iv_month != rec_month


def backfill_recruiting_date(df: DataFrame, file_col: str | None = None,
                             faithful: bool = False) -> DataFrame:
    """Coalesce + conditional month repair over a whole multi-file batch.

    ``df`` needs columns: id, IVDate1 (dd.MM.yyyy HH:mm:ss string),
    Q5011_2T (ISO datetime string or NULL/'nan'). When ``file_col`` is
    given, the month-mismatch decision is taken from the first row *per
    file* (reference semantics, add_q5011_2t.py:28); otherwise per-batch.

    ``faithful=True`` reproduces the reference's no-year-rollover month
    surgery (bug: December → month "13", add_q5011_2t.py:96-100);
    default is the correct ``add_months``.
    """
    iv_ts = scalar.parse_ru_timestamp(F.col("IVDate1"))
    iv_iso = scalar.iso_datetime(iv_ts)
    rec = scalar.nullify_nan_string(F.col("Q5011_2T"))

    part = [file_col] if file_col else [F.lit(1)]
    w = (Window.partitionBy(*part).orderBy(F.col("id"))
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    # Reference peek semantics (add_q5011_2t.py:27-45): IVDate1 comes
    # from the literal FIRST row (iloc[0], nulls included), while the
    # recruiting month comes from the first row whose Q5011_2T is
    # neither NaN nor "nan" — those can be different rows.
    first_iv = F.first(iv_ts).over(w)
    first_rec = F.first(rec, ignorenulls=True).over(w)
    shifted = month_mismatch_flag(first_iv, first_rec)

    if faithful:
        repaired = scalar.month_increment_faithful(rec)
    else:
        repaired = scalar.iso_datetime(
            scalar.month_increment(F.to_timestamp(rec, "yyyy-MM-dd HH:mm:ss")))

    # update_table (add_q5011_2t.py:56-69): a NULL/"nan" recruiting date
    # falls back to the reformatted IVDate1 and is NEVER month-repaired;
    # the repair applies only to originally-present values.
    return df.withColumn(
        "q5011_2t",
        F.when(rec.isNull(), iv_iso).when(shifted, repaired).otherwise(rec),
    )
