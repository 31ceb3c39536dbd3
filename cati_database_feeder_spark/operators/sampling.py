"""Deterministic sampling operators for training-data mixing.

A pretraining pipeline rarely trains on the raw corpus mix: it
up-samples high-value strata (curated sources, target languages) and
down-samples the rest, and the selection must be REPRODUCIBLE — the
same document keeps or drops its slot on any engine, any cluster size,
any rerun, so ablations and incremental rebuilds stay comparable.

Random `df.sample()` gives none of that (seed is partition-dependent).
Hash-gating gives all of it: keep a row iff
``md5hash(key) mod GRAIN < fraction * GRAIN``. The gate is a pure
projection-level predicate — map-only, zero shuffle, pushed into the
scan like any other filter — so sampling 100 TB costs one pass and
composes with partition pruning. md5 keeps the gate portable across
engines (same property the oracle relies on everywhere else;
functions/text.py:hash64).

Generalizes the reference's per-wave scoping (feeder.py:127-143 reads
exactly one wave) to per-stratum fractional scoping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from cati_database_feeder_spark.functions import text as T

# gate granularity: fractions are exact multiples of 1/GRAIN, so every
# threshold is an integer compare (no float-vs-decimal drift between
# engines)
GRAIN = 10_000


def stratified_sample(df: DataFrame, stratum_col: str, key_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0) -> DataFrame:
    """Keep each row with its stratum's fraction, deterministically by
    ``key_col``: the hash gate assigns every key a stable bucket in
    [0, GRAIN) and a stratum keeps buckets below fraction*GRAIN. Strata
    absent from ``fractions`` fall back to ``default_fraction``.
    Rows pass or fail independently of partitioning and execution order
    — the property that makes ablation A/B corpora reconstructible."""
    bucket = T.hash64(F.col(key_col).cast("string")) % GRAIN
    threshold: Column = F.lit(int(round(default_fraction * GRAIN)))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(F.col(stratum_col) == value,
                           F.lit(int(round(frac * GRAIN)))).otherwise(threshold)
    return df.filter(bucket < threshold)


def global_shuffle_ordinals(df: DataFrame, key: Column,
                            tie_cols: list[str],
                            partitions: int | None = None) -> DataFrame:
    """Assign every row its global ordinal under a deterministic
    pseudo-random permutation — the corpus-shuffle step that fixes a
    training order (epoch slicing, resumable loaders) reproducibly.

    The naive form, ``row_number() OVER (ORDER BY key)``, is a
    single-partition global sort — the one shape that cannot scale.
    This is its distributed twin:

    1. range-partition by the shuffle key (Spark's sampled
       RangePartitioner — partition i holds strictly smaller keys than
       partition i+1),
    2. per-partition row counts → cumulative offsets. The collect is
       bounded by the PARTITION COUNT, not the data (one long per
       partition — the same bounded-driver-state class as IVF
       centroids, similarity.py),
    3. local sort + local row_number + broadcast-joined offset.

    The result equals the global rank by (key, tie_cols) for ANY
    partition boundaries, because range partitions are totally ordered
    on the key. That invariant holds only if steps 2 and 3 observe the
    SAME boundaries: Spark's RangePartitioner samples boundaries per
    query execution (seeded from the shuffle RDD's id), so an unpinned
    plan executed twice — once for the counts collect, once for the
    consumer's action — can land DIFFERENT boundaries, making the
    collected offsets inconsistent with the final job's partition
    assignment (duplicated/gapped ordinals; small uniform inputs mask
    it, large/skewed ones don't). The ranged frame is therefore
    persisted (MEMORY_AND_DISK) before the counts job: the collect
    materializes the cache, and every downstream action reads the same
    stored blocks instead of re-sampling the shuffle.

    Caller contract: the returned DataFrame reads a pinned intermediate
    that is the size of ``df``. After materializing the result, call
    :func:`release_ordinals` on it (or let session-end / LRU eviction
    reclaim the blocks). ``key`` should be a hash of a stable id
    (md5 → deterministic permutation on any engine/cluster/rerun)."""
    spark = df.sparkSession
    n = partitions or spark.sparkContext.defaultParallelism
    ranged = (df.withColumn("__key", key)
              .repartitionByRange(n, "__key", *tie_cols)
              .withColumn("__pid", F.spark_partition_id())
              .persist(StorageLevel.MEMORY_AND_DISK))
    counts = sorted((r["__pid"], r["cnt"]) for r in
                    ranged.groupBy("__pid")
                          .agg(F.count(F.lit(1)).alias("cnt")).collect())
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off = spark.createDataFrame(offsets, "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy("__key", *tie_cols)
    out = (ranged.join(F.broadcast(off), "__pid")
           .withColumn("pos", F.row_number().over(w) + F.col("__off"))
           .drop("__key", "__pid", "__off"))
    out._graft_pinned = ranged
    return out


def release_ordinals(out: DataFrame) -> None:
    """Unpersist the intermediate pinned by :func:`global_shuffle_ordinals`.
    Safe to call on any DataFrame; a no-op if nothing is pinned."""
    pinned = getattr(out, "_graft_pinned", None)
    if pinned is not None:
        pinned.unpersist()
        out._graft_pinned = None
