"""Scalar column expressions covering SURVEY.md §2.2-2.3 (ops #13-#33).

Every transform the reference performs row-by-row inside ``iterrows()``
(reference feeder.py:156-225) is re-expressed here as a built-in Spark
Column expression — JVM-side, whole-stage-codegen-able, zero Python in
the hot path. Each helper cites the reference behavior it covers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RU_TS_FORMAT = "dd.MM.yyyy HH:mm:ss"  # reference feeder.py:173 strptime format

SMALLINT_MAX = 32767  # reference feeder.py:180-182 Postgres smallint guard


def normalize_nan(col: Column) -> Column:
    """Op #13 (feeder.py:146 ``replace({np.nan: None})``): map NaN to NULL
    so float NaNs behave like SQL NULLs downstream."""
    return F.when(F.isnan(col), F.lit(None)).otherwise(col)


def nullify_nan_string(col: Column) -> Column:
    """Op #30 precondition (add_q5011_2t.py:34 ``== "nan"``): pandas
    stringified-NaN sentinel becomes a real NULL."""
    return F.nullif(col, F.lit("nan"))


def status_case(result: Column, complete_value: str = "Полное",
                complete_status: str = "Комплит",
                interrupted_status: str = "Прервано") -> Column:
    """Op #16 (feeder.py:168-171): conditional status mapping."""
    return (F.when(result == complete_value, F.lit(complete_status))
             .otherwise(F.lit(interrupted_status)))


def reject_predicate(result: Column, reject_value: str = "Брак") -> Column:
    """Op #15 (feeder.py:163-166): keep rows whose result is not the
    reject marker. Null-safe — NULL results are kept, as in the
    reference (``if result == "Брак"`` is False for None)."""
    return ~result.eqNullSafe(reject_value)


def parse_ru_timestamp(col: Column) -> Column:
    """Op #22 (feeder.py:173): ``dd.MM.yyyy HH:mm:ss`` → timestamp."""
    return F.to_timestamp(col, RU_TS_FORMAT)


def iso_date(ts: Column) -> Column:
    """Op #23 (feeder.py:174): timestamp → ``yyyy-MM-dd`` string."""
    return F.date_format(ts, "yyyy-MM-dd")


def iso_datetime(ts: Column) -> Column:
    """Op #24 (add_q5011_2t.py:63): timestamp → ``yyyy-MM-dd HH:mm:ss``."""
    return F.date_format(ts, "yyyy-MM-dd HH:mm:ss")


def truncate_str(col: Column, length: int = 100) -> Column:
    """Op #26 (feeder.py:205 ``row["Q2"][:100]``): fit varchar(n)."""
    return F.substring(col, 1, length)


def clamp_smallint(col: Column) -> Column:
    """Op #27 (feeder.py:180-182): clamp to Postgres smallint max."""
    return F.least(col, F.lit(SMALLINT_MAX))


def zero_pad2(col: Column) -> Column:
    """Op #28 (add_q5011_2t.py:96-100 ``f"{month:02d}"``)."""
    return F.lpad(col.cast("string"), 2, "0")


def month_increment(ts: Column) -> Column:
    """Op #29, CORRECT semantics: calendar-aware month shift.

    The reference rebuilds the date string with ``month+1`` and no year
    rollover, producing an invalid ``"…-13-…"`` for December
    (add_q5011_2t.py:85-100 — a reference bug). The engine uses
    interval arithmetic (which, unlike ``add_months``, keeps the time
    component); the faithful string-surgery variant is
    :func:`month_increment_faithful` and the divergence is documented
    in its docstring and tests.
    """
    return ts + F.expr("INTERVAL 1 MONTH")


def month_increment_faithful(datestr: Column) -> Column:
    """Op #29, FAITHFUL semantics (reference bug preserved on purpose,
    add_q5011_2t.py:85-100): string surgery ``{year}-{month+1:02d}-{rest}``
    with no year rollover, so December yields month "13". Provided only
    so behavior parity with the reference is demonstrable; the engine
    default is :func:`month_increment`."""
    year = F.substring(datestr, 1, 4)
    month = F.substring(datestr, 6, 2).cast("int") + F.lit(1)
    rest = F.substr(datestr, F.lit(9), F.length(datestr))
    return F.concat(year, F.lit("-"), zero_pad2(month), F.lit("-"), rest)


def coalesce_recruiting_date(q5011_2t: Column, ivdate_iso: Column) -> Column:
    """Op #30 (add_q5011_2t.py:65-66): fall back to the reformatted
    interview date when the recruiting date is NULL or "nan"."""
    return F.coalesce(nullify_nan_string(q5011_2t), ivdate_iso)


def wave_from_project_name(name: Column, strip_w: bool = False) -> Column:
    """Op #25 (feeder.py:124-125; feeder_w6.py:125-126): wave id = last
    two chars of the project name; w6 variant strips a leading 'w'."""
    tail = F.right(name, F.lit(2))
    return F.regexp_replace(tail, "w", "") if strip_w else tail


def clean_log_tail(log: Column) -> Column:
    """Op #31 (feeder.py:97-101): split the export log on newlines, drop
    empty lines, take the last entry — as array expressions."""
    lines = F.split(log, "\n")
    nonempty = F.filter(lines, lambda x: x != F.lit(""))
    return F.element_at(nonempty, -1)


def optional_column(df_columns: list[str], name: str, dtype: str = "double") -> Column:
    """Op #19 (feeder.py:176-178 ``row.get(col, None)``): schema-evolution
    guard — reference waves may lack reward columns entirely."""
    if name in df_columns:
        return F.col(name)
    return F.lit(None).cast(dtype)
