"""Arrow-vectorized UDAFs (SURVEY.md §2.9).

Engine policy: built-in expressions first — every reference op #13-#33
maps to one, so reference parity needs ZERO Python. This module is the
escape hatch for aggregates that genuinely have no built-in form; each
runs as a pandas_udf GROUPED_AGG, meaning Arrow-batched columnar
transfer and one Python call per group — never per row.

The cost model at 100 TB: a GROUPED_AGG UDAF cannot partial-aggregate
(no map-side combine), so the full group's values shuffle to one task.
Use it only when (a) the aggregate is truly not expressible with
built-ins + HOFs, and (b) per-group cardinality is bounded. Both are
documented per function; anything unbounded should be restructured
(sketching, pre-bucketing) before reaching for Python.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_median(values: pd.Series, weights: pd.Series) -> float:
    """Weighted median: smallest v with cumulative weight >= half the
    total. No Spark built-in expresses this (percentile_approx has no
    weight argument; exact `median` ignores weights). NULL-weight or
    NULL-value rows are dropped, matching SQL aggregate semantics.

    Scale note: the group's (value, weight) pairs land in one task —
    bounded per-group cardinality is the caller's contract. For
    unbounded groups use a weighted t-digest sketch instead.
    """
    df = pd.DataFrame({"v": values, "w": weights}).dropna()
    if df.empty:
        return None
    df = df.sort_values("v")
    cum = df["w"].cumsum()
    half = df["w"].sum() / 2.0
    return float(df.loc[cum >= half, "v"].iloc[0])


@pandas_udf("double")
def trimmed_mean(values: pd.Series) -> float:
    """Mean of the middle 80% (10% trimmed at each tail) — the robust
    location estimate quality pipelines use to ignore outlier scores.
    Not expressible with built-ins without two percentile passes plus a
    re-filter join; one vectorized group call replaces three jobs.

    The sum is math.fsum — exactly rounded, so the result is independent
    of row order (a pairwise/sequential float sum is not), which is what
    lets a SQL oracle reproduce it bit-for-bit on integer-valued inputs."""
    v = values.dropna().sort_values()
    if v.empty:
        return None
    k = int(len(v) * 0.1)
    trimmed = v.iloc[k:len(v) - k] if len(v) > 2 * k else v
    return float(math.fsum(trimmed)) / len(trimmed)
