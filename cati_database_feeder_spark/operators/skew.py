"""Skew mitigation operators (SURVEY.md §7 hard part (d)).

At 100 TB a single hot key (one wave, one boilerplate fingerprint, one
null-ish default) turns a shuffle into one straggler task. Two
mitigations, both plain DataFrame ops:

- **Salted aggregation**: two-phase agg — first over (key, salt) with a
  random-uniform salt spreading the hot key over N partitions, then the
  exact final agg over key. Works for any algebraic aggregate
  (sum/count/min/max); shown here for the decimal-exact dsum.
- **Salted broadcast-side replication join**: the skewed (fact) side
  gets a random salt in [0, N); the small side is replicated N times
  with every salt value, and the join key becomes (key, salt). The hot
  key's rows now land in N partitions instead of one. Only correct for
  joins where the small side is duplicated per salt (inner/left with
  distinct small-side keys) — which is exactly the dimension-join shape
  where skew shows up.

AQE (spark.sql.adaptive.skewJoin, enabled in session.py) already splits
skewed SORT-MERGE join partitions at runtime; explicit salting remains
necessary for skewed AGGREGATIONS and for hash-partitioned stateful ops
where AQE cannot re-split.

Salts use F.rand(seed) — deterministic per seed, uniform per row; the
aggregate result is exactly independent of the salt values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, keys: list[str], aggs: list[Column],
               partial_aggs: list[Column], n_salts: int = 8,
               seed: int = 42) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs`` run per (keys, salt); ``aggs`` combine the partials
    per keys. Caller pairs them so that final(partial) == direct agg —
    e.g. partial ``F.count(...).alias("c")`` with final
    ``F.sum("c").alias("c")``. Exact for algebraic aggregates.
    """
    salt = (F.rand(seed) * n_salts).cast("int").alias("__salt")
    partial = (df.withColumn("__salt", salt)
               .groupBy(*keys, "__salt")
               .agg(*partial_aggs))
    return partial.groupBy(*keys).agg(*aggs)


def replicate_salt_join(fact: DataFrame, dim: DataFrame, on: str,
                        n_salts: int = 8, seed: int = 42,
                        how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dim side
    across all salt values, join on (key, salt). Row-for-row identical
    to ``fact.join(dim, on, how)`` for inner/left joins with unique
    dim keys; the hot key's probe rows spread over ``n_salts`` tasks.
    """
    salted_fact = fact.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = salted_fact.join(replicated_dim, [on, "__salt"], how)
    return out.drop("__salt")


def key_occupancy_report(keyed: DataFrame, key_cols: list[str],
                         cap: int) -> DataFrame:
    """Per-key occupancy diagnostic for within-key pair generation
    (round-8 verdict item 1): every bucket-pair operator —
    SemDeDup cells (operators/similarity.py:semdedup_pairs), MinHash
    band buckets (operators/dedup.py:_bucket_pairs consumers) — emits
    O(m²) pairs for a key of occupancy m. The plan SHAPE is linear
    (equi-join on the key), so no plan pin can see the hazard: a
    k-means cell holding 10% of a 100 TB corpus makes that cell's pair
    set ~(0.1n)², a job-killer with a perfectly healthy plan. This
    report is the occupancy lens: per key, the occupancy, the EXACT
    pair count m·(m-1)/2 that key will emit (integer arithmetic —
    exact past 2^53 pairs would overflow doubles long before the job
    finished anyway), and whether it exceeds ``cap`` (``hot``).

    One aggregate over the same key the pair join shuffles on — run it
    BEFORE the pair job at 100 TB (it is ~free next to the pair join
    and reuses the exchange if run in the same plan) and react to hot
    keys: sub-split them (similarity.subsplit_hot_cells), cap them
    (``_bucket_pairs(max_occupancy=...)``), or retrain the quantizer
    (train_ivf_centroids(max_share=...)).
    """
    return (keyed.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("occupancy"))
            .withColumn("est_pairs",
                        F.expr("(occupancy * (occupancy - 1)) DIV 2"))
            .withColumn("hot", F.col("occupancy") > cap))
