"""Similarity search over embedding columns (north-star E7).

Three tiers, trading recall for scale:

1. ``brute_force_topk`` — exact: score every (query, corpus) pair.
   Correctness baseline and perfectly fine when one side broadcasts.
2. ``lsh_topk`` — random-hyperplane (sign) LSH: bucket by signature
   prefix, score only within buckets. Sub-linear candidate sets; the
   bucket join is an equi-join (one shuffle), never a crossJoin.
3. ``ivf_topk`` — IVF: coarse-quantize the corpus to centroid cells
   (k-means style), probe the nearest ``nprobe`` cells per query.
   This is the 100 TB shape: the corpus is partitioned by cell id
   once (write-time layout), and each query touches a few cells.

All scoring is the deterministic double-precision cosine from
functions/vectors.py (JVM higher-order functions, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cati_database_feeder_spark.session import local_frame

from cati_database_feeder_spark.functions import vectors as V


def _two_level_rank(scored: DataFrame, part_col: str, order_cols,
                    k: int, rank_col: str = "rank") -> DataFrame:
    """Per-``part_col`` rank filtered to ≤ ``k`` WITHOUT a
    group-spanning single-task sort (round-10, generalizing the JL
    fix to the whole top-k family): level 1 prunes each
    (group, input-partition) slice to its local top k — any row of the
    global top k has local rank ≤ its global rank under EVERY
    partitioning, so the survivor union is a superset — and level 2
    ranks the ≤ k·n_partitions survivors. Bit-identical to the single
    window for any deterministic ``order_cols``; the level-1 sort
    parallelizes across partitions instead of funneling every row of a
    group through one task. Callers should slim ``scored`` to the
    (group, id, score) columns first so neither exchange carries
    vectors."""
    lvl1 = Window.partitionBy(part_col, "__part").orderBy(*order_cols)
    lvl2 = Window.partitionBy(part_col).orderBy(*order_cols)
    return (scored.withColumn("__part", F.spark_partition_id())
            .withColumn("__l1r", F.row_number().over(lvl1))
            .filter(F.col("__l1r") <= k)
            .withColumn(rank_col, F.row_number().over(lvl2))
            .filter(F.col(rank_col) <= k)
            .drop("__part", "__l1r"))


def _topk_output(scored: DataFrame, q_id: str, c_id: str,
                 k: int) -> DataFrame:
    """The standard exact-rerank tail shared by the whole top-k family:
    slim to (query, id, cosine), two-level rank with the deterministic
    (cosine desc, id asc) tie-break, emit (q_id, c_id, cosine, rank)."""
    ranked = _two_level_rank(
        scored.select(q_id, c_id, "cosine"), q_id,
        [F.desc("cosine"), F.asc(c_id)], k)
    return ranked.select(q_id, F.col(c_id),
                         F.round("cosine", 6).alias("cosine"), "rank")


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
                     q_id: str = "q_id", q_vec: str = "q_vec",
                     c_id: str = "vec_id", c_vec: str = "embedding",
                     broadcast_queries: bool = False) -> DataFrame:
    """Exact top-k: score every (query, corpus) pair, rank per query
    with a deterministic tie-break. Norms are pre-computed per vector
    (not per pair) — bit-identical cosine, a third of the per-pair
    array folds.

    No forced broadcast by default: Catalyst/AQE already picks
    BroadcastNestedLoopJoin when the query side is under the broadcast
    threshold, and a forced hint is honored REGARDLESS of size — a
    query frame derived from the corpus grows linearly with data and
    would OOM the driver at scale (the same rule written into
    queryset.py's q18 docstring). ``broadcast_queries=True`` is the
    explicit opt-in for a serving contract whose query set is bounded
    by construction."""
    qn = queries.withColumn("__qn", V.norm(F.col(q_vec)))
    q = F.broadcast(qn) if broadcast_queries else qn
    scored = (corpus.withColumn("__cn", V.norm(F.col(c_vec)))
              .crossJoin(q)
              .withColumn("cosine", V.cosine_from_norms(
                  F.col(c_vec), F.col(q_vec), F.col("__cn"), F.col("__qn"))))
    return _topk_output(scored, q_id, c_id, k)


def gaussian_hyperplanes(dim: int, n_bits: int = 8,
                         seed: int = 7) -> list[list[float]]:
    """``n_bits`` random hyperplane normals ~ N(0, I_dim) from a FIXED
    seed (legacy MT19937 RandomState — its standard_normal stream is
    frozen by numpy's compatibility policy, so the planes are stable
    across versions, runs and engines). Generated once on the driver,
    embedded as plan literals — the same determinism trick as the IVF
    centroid literals (:func:`_centroid_literal`): no broadcast, no
    join, and a SQL oracle can carry the identical constants verbatim.

    This is the production bucketing for :func:`with_lsh_bucket`:
    coordinate-sign planes (the ``hyperplanes=None`` fallback) degrade
    badly on anisotropic real embeddings, where leading dimensions
    share signs corpus-wide and most of the corpus lands in a handful
    of buckets; Gaussian directions split any direction of variance
    with probability proportional to the angle (Charikar 2002), so
    bucket balance tracks the data's actual spread."""
    import numpy as np
    rs = np.random.RandomState(seed)
    return [[float(x) for x in row]
            for row in rs.standard_normal((n_bits, dim))]


def with_lsh_bucket(df: DataFrame, vec_col: str, n_bits: int = 8,
                    out_col: str = "bucket",
                    hyperplanes: list[list[float]] | None = None) -> DataFrame:
    """Random-hyperplane signature: bit i = sign of ⟨v, h_i⟩ over the
    literal plane matrix (one sequential-fold dot per bit, JVM-side,
    bit-reproducible against a SQL oracle's ``list_dot_product``).
    With ``hyperplanes=None`` falls back to the first ``n_bits``
    coordinate signs — deterministic and cheap, but balance-fragile on
    anisotropic embeddings; pass :func:`gaussian_hyperplanes` output
    for the production bucketing (its docstring has the argument)."""
    if hyperplanes is None:
        return df.withColumn(
            out_col, F.substring(V.simhash_sign(F.col(vec_col)), 1, n_bits))
    if len(hyperplanes) != n_bits:
        raise ValueError(
            f"hyperplanes count {len(hyperplanes)} != n_bits {n_bits}")
    # ONE transform over a 2-D plane literal, not n_bits inlined
    # dot-product folds: the inlined form compiles n_bits separate
    # zip_with/aggregate chains per row (the same finding that fixed
    # lsh_recall_check 9.3→6.5 s in round 8; measured here round 9:
    # warm-min 1.43→1.12 s on embedding_lsh_topk at sf0.1 — the rest
    # of the Gaussian-vs-coordinate gap is the irreducible
    # n_bits×dim multiply-adds per row that buy the recall).
    # Arithmetic is the identical sequential-fold dot per plane, so
    # bucket values — and the SQL oracle — are unchanged.
    planes = V.lit_nested([[float(x) for x in p] for p in hyperplanes])
    bits = F.transform(
        planes,
        lambda p: F.when(V.dot(F.col(vec_col), p) >= 0,
                         F.lit("1")).otherwise(F.lit("0")))
    return df.withColumn(out_col, F.array_join(bits, ""))


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
             n_bits: int = 8, q_id: str = "q_id", q_vec: str = "q_vec",
             c_id: str = "vec_id", c_vec: str = "embedding",
             hyperplanes: list[list[float]] | None = None) -> DataFrame:
    """Approximate top-k: candidates share the LSH bucket (equi-join),
    exact cosine rerank within candidates (norms pre-computed per
    vector, see brute_force_topk). The bucket join is hint-free: AQE
    broadcasts the query side when it is genuinely small, and a
    corpus-derived query frame (which scales with data) falls back to
    a shuffle join instead of an unconditional broadcast. Pass
    :func:`gaussian_hyperplanes` output as ``hyperplanes`` for the
    production bucketing (balance on anisotropic embeddings)."""
    qb = (with_lsh_bucket(queries, q_vec, n_bits, hyperplanes=hyperplanes)
          .withColumn("__qn", V.norm(F.col(q_vec))))
    cb = (with_lsh_bucket(corpus, c_vec, n_bits, hyperplanes=hyperplanes)
          .withColumn("__cn", V.norm(F.col(c_vec))))
    scored = (cb.join(qb, on="bucket")
              .withColumn("cosine", V.cosine_from_norms(
                  F.col(c_vec), F.col(q_vec), F.col("__cn"), F.col("__qn"))))
    return _topk_output(scored, q_id, c_id, k)


def with_lsh_table_buckets(df: DataFrame, vec_col: str, id_col: str,
                           hyperplanes: list[list[float]],
                           n_bits: int, n_tables: int,
                           kernel: str = "hof") -> DataFrame:
    """(id, tbl, bucket) signature rows for multi-TABLE LSH: table t
    buckets by the signs of planes [t·n_bits, (t+1)·n_bits). One
    map-only projection per row exploding to ``n_tables`` rows — the
    standard L-tables recall amplifier (collide in ANY table ⇒
    candidate): per-table collision p^b becomes 1-(1-p^b)^L.

    Two kernels, same output contract:

    - ``"hof"`` (default): plane dots as sequential JVM folds over
      literals — bit-reproducible in a SQL oracle. The signature pass
      is Catalyst-HOF-interpreted, ~3.2 s for 2k×64-plane at sf0.1.
    - ``"arrow"``: one Arrow-batched numpy matmul per partition
      (``mapInPandas`` — the documented legitimate Python tier, like
      the multimodal decoders): measured 0.48 s on the same input,
      6.7×, zero bucket disagreements on the test corpus. CAVEAT:
      BLAS reorders the accumulation, so a knife-edge dot (|⟨v,h⟩|
      within float error of 0) can flip a sign vs the sequential
      fold — buckets are NOT bit-contractual across kernels. Use hof
      wherever a SQL oracle replays the signatures value-by-value;
      arrow for serving paths and recall-gated contracts, where a
      boundary flip moves one candidate, not a verdict."""
    if len(hyperplanes) != n_bits * n_tables:
        raise ValueError(f"need n_bits*n_tables={n_bits * n_tables} "
                         f"hyperplanes, got {len(hyperplanes)}")
    if kernel == "arrow":
        return _table_buckets_arrow(df, vec_col, id_col, hyperplanes,
                                    n_bits, n_tables)
    if kernel != "hof":
        raise ValueError(f"kernel must be 'hof' or 'arrow', got {kernel!r}")
    # ONE transform over a 2-D plane literal instead of n_bits*n_tables
    # inlined dot-product folds: the inlined form compiles ~L·b separate
    # zip_with/aggregate chains per row (measured: codegen+eval made the
    # recall gate the 2nd most expensive bench entry); the HOF loop
    # compiles once and evaluates the same sequential-fold dots. Staged
    # as its own projection so the bits compute once per row, then each
    # table's bucket is a slice+join of the staged array.
    planes = V.lit_nested([[float(x) for x in p] for p in hyperplanes])
    bits = F.transform(
        planes,
        lambda p: F.when(V.dot(F.col(vec_col), p) >= 0,
                         F.lit("1")).otherwise(F.lit("0")))
    staged = df.select(F.col(id_col), bits.alias("__bits"))
    rows = [F.struct(F.lit(t).alias("tbl"),
                     F.array_join(F.slice("__bits", t * n_bits + 1, n_bits),
                                  "").alias("bucket"))
            for t in range(n_tables)]
    return (staged.select(id_col, F.explode(F.array(*rows)).alias("s"))
            .select(id_col, "s.tbl", "s.bucket"))


def _table_buckets_arrow(df: DataFrame, vec_col: str, id_col: str,
                         hyperplanes: list[list[float]],
                         n_bits: int, n_tables: int) -> DataFrame:
    """Arrow kernel for :func:`with_lsh_table_buckets`: per Arrow
    batch, ONE numpy (rows × dim)·(dim × planes) matmul computes every
    sign bit, then per-table buckets slice the bit matrix. Plane
    matrix ships by broadcast (a few KB); output is the same
    (id, tbl, bucket) contract as the HOF kernel."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (IntegerType, StringType, StructField,
                                   StructType)

    id_type = df.schema[id_col].dataType
    schema = StructType([StructField(id_col, id_type),
                         StructField("tbl", IntegerType()),
                         StructField("bucket", StringType())])
    bplanes = df.sparkSession.sparkContext.broadcast(
        np.asarray(hyperplanes, dtype=np.float64).T)

    def batches(it):
        P = bplanes.value
        for pdf in it:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].values).astype(np.float64)
            S = (V @ P) >= 0
            ids = pdf[id_col].values
            frames = []
            for t in range(n_tables):
                chunk = S[:, t * n_bits:(t + 1) * n_bits]
                frames.append(pd.DataFrame({
                    id_col: ids,
                    "tbl": t,
                    "bucket": ["".join("1" if b else "0" for b in row)
                               for row in chunk]}))
            yield pd.concat(frames, ignore_index=True)

    return df.select(id_col, vec_col).mapInPandas(batches, schema)


def lsh_topk_tables(queries: DataFrame, corpus: DataFrame,
                    hyperplanes: list[list[float]], k: int = 10,
                    n_bits: int = 4, n_tables: int = 16,
                    q_id: str = "q_id", q_vec: str = "q_vec",
                    c_id: str = "vec_id",
                    c_vec: str = "embedding",
                    kernel: str = "hof") -> DataFrame:
    """Approximate top-k with L-table LSH: candidates collide in at
    least one of ``n_tables`` independent ``n_bits``-bit sign
    signatures, then exact cosine rerank. The production recall knob
    single-bucket :func:`lsh_topk` lacks — measured recall@10 on the
    synthetic embeddings: 0.10 single-table b=8 vs 0.94+ at b=4 L=16.

    Scale shape: signatures are map-only (×L row amplification on ids
    only — vectors do NOT ride the explode); candidates come from one
    equi-join on (tbl, bucket) followed by a distinct on the id pair;
    vectors are fetched by id for the rerank (two hash joins against
    the id-keyed frames). Everything shuffles on bounded derived keys;
    no crossJoin anywhere; AQE broadcasts the query side of each join
    when genuinely small."""
    qs = with_lsh_table_buckets(queries, q_vec, q_id,
                                hyperplanes, n_bits, n_tables, kernel)
    cs = with_lsh_table_buckets(corpus, c_vec, c_id,
                                hyperplanes, n_bits, n_tables, kernel)
    cands = (qs.join(cs, ["tbl", "bucket"])
             .select(q_id, c_id).distinct())
    qv = queries.withColumn("__qn", V.norm(F.col(q_vec)))
    cv = corpus.withColumn("__cn", V.norm(F.col(c_vec)))
    scored = (cands.join(cv, c_id).join(qv, q_id)
              .withColumn("cosine", V.cosine_from_norms(
                  F.col(c_vec), F.col(q_vec), F.col("__cn"), F.col("__qn"))))
    return _topk_output(scored, q_id, c_id, k)


def cosine_near_dup_pairs(corpus: DataFrame, threshold: float = 0.9,
                          n_bits: int = 8, c_id: str = "vec_id",
                          c_vec: str = "embedding",
                          hyperplanes: list[list[float]] | None = None) -> DataFrame:
    """Embedding-level near-dup: pairs in the same sign-LSH bucket with
    cosine >= threshold. Candidate generation is an equi-join on the
    bucket (one shuffle); only candidates pay the exact cosine. The
    bucketing is deterministic (coordinate planes by default, seeded
    Gaussian planes via ``hyperplanes``), so recall misses are a fixed
    property of the algorithm, not run-to-run noise — high-cosine
    pairs almost always land on the same side of every plane."""
    from cati_database_feeder_spark.operators.dedup import _bucket_pairs
    cb = with_lsh_bucket(corpus, c_vec, n_bits, hyperplanes=hyperplanes)
    cands = _bucket_pairs(cb.selectExpr(f"{c_id} as id", "bucket"), ["bucket"], "id")
    # norms once per vector, not once per pair (V.cosine_from_norms)
    v_a = corpus.select(F.col(c_id).alias("id_a"), F.col(c_vec).alias("va"),
                        V.norm(F.col(c_vec)).alias("na"))
    v_b = corpus.select(F.col(c_id).alias("id_b"), F.col(c_vec).alias("vb"),
                        V.norm(F.col(c_vec)).alias("nb"))
    return (cands.join(v_a, "id_a").join(v_b, "id_b")
            .withColumn("cos_raw", V.cosine_from_norms(
                F.col("va"), F.col("vb"), F.col("na"), F.col("nb")))
            .filter(F.col("cos_raw") >= threshold)
            .select("id_a", "id_b", F.round("cos_raw", 6).alias("cosine")))


def semdedup_pairs(corpus: DataFrame,
                   centroid_rows: list[tuple[int, list[float]]],
                   threshold: float = 0.9, by: str = "ip",
                   c_id: str = "vec_id",
                   c_vec: str = "embedding",
                   assigned: DataFrame | None = None) -> DataFrame:
    """SemDeDup-style semantic near-dup (Abbas et al. 2023, "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication"): partition the embedding space into coarse cells
    (k-means centroids — here injected, so a fixed seed set makes the
    whole operator deterministic and SQL-oracle-able), then emit pairs
    with cosine >= threshold WITHIN each cell. Cross-cell near-dups
    are the accepted recall loss that buys the scale shape — candidate
    generation is an equi-join on the cell id, never corpus², and with
    the corpus parquet partitioned by cell (write-time layout, see
    ``ivf_topk``) each cell's pairs compute cell-locally.

    Same verify arithmetic as :func:`cosine_near_dup_pairs` (norms
    once per vector, deterministic double cosine); only the bucketing
    differs — semantic cells instead of sign-LSH planes, which groups
    paraphrases that flip individual dimension signs.

    ``assigned``: optionally pass a pre-computed (persisted/
    materialized) cell assignment of ``corpus`` — the write-time
    layout at 100 TB is exactly that (the vector table is stored
    partitioned by cell), so consumers sharing one assignment is the
    production shape, not a cache trick."""
    from cati_database_feeder_spark.operators.dedup import _bucket_pairs
    if assigned is None:
        assigned = assign_cells(corpus, centroid_rows, c_vec, by)
    cands = _bucket_pairs(
        assigned.select(F.col(c_id).alias("id"), "cell"), ["cell"], "id")
    v_a = corpus.select(F.col(c_id).alias("id_a"), F.col(c_vec).alias("va"),
                        V.norm(F.col(c_vec)).alias("na"))
    v_b = corpus.select(F.col(c_id).alias("id_b"), F.col(c_vec).alias("vb"),
                        V.norm(F.col(c_vec)).alias("nb"))
    return (cands.join(v_a, "id_a").join(v_b, "id_b")
            .withColumn("cos_raw", V.cosine_from_norms(
                F.col("va"), F.col("vb"), F.col("na"), F.col("nb")))
            .filter(F.col("cos_raw") >= threshold)
            .select("id_a", "id_b", F.round("cos_raw", 6).alias("cosine")))


def incremental_semdedup_pairs(delta: DataFrame, corpus_assigned: DataFrame,
                               centroid_rows: list[tuple[int, list[float]]],
                               threshold: float = 0.9, by: str = "ip",
                               c_id: str = "vec_id",
                               c_vec: str = "embedding") -> DataFrame:
    """SemDeDup for a NEW batch against an existing corpus — the
    embedding-family twin of dedup.incremental_near_dup_pairs_from_store
    (round-7 verdict item 2): re-running :func:`semdedup_pairs` over
    corpus ∪ delta per ingest is a full corpus-pairing pass per batch;
    this probes only the delta's OWN cells. Output is exactly
    ``semdedup_pairs(corpus ∪ delta)`` restricted to pairs with at
    least one delta member (ids disjoint by the caller's ingest
    contract, as in the near-dup family): cell assignment is a pure
    per-row function of the vector, so a delta-touching pair in the
    full run is either delta×corpus within one cell or delta×delta
    within one cell — both enumerated here, neither twice (each vector
    has exactly one cell).

    ``corpus_assigned`` is the CELL STORE — (vec_id, embedding, cell),
    maintained by appending ``assign_cells(delta, ...)`` after each
    committed batch (centroids stay fixed after training, so stored
    assignments never go stale). At 100 TB it is parquet partitioned
    by ``cell``: the delta×corpus equi-join prunes to the batch's own
    cells and per-batch cost is batch size × matched-cell occupancy,
    never corpus². No hints: AQE broadcasts a genuinely small delta.

    Same verify arithmetic as :func:`semdedup_pairs` (norms once per
    vector, deterministic double cosine, threshold on the raw value)."""
    d = (assign_cells(delta, centroid_rows, c_vec, by)
         .select(F.col(c_id).alias("did"), F.col(c_vec).alias("dv"),
                 V.norm(F.col(c_vec)).alias("dn"), "cell"))
    c = corpus_assigned.select(F.col(c_id).alias("cid"),
                               F.col(c_vec).alias("cv"),
                               V.norm(F.col(c_vec)).alias("cn"), "cell")
    cross = (c.join(d, "cell")
             .withColumn("cos_raw", V.cosine_from_norms(
                 F.col("cv"), F.col("dv"), F.col("cn"), F.col("dn")))
             .filter(F.col("cos_raw") >= threshold)
             .select(F.least("cid", "did").alias("id_a"),
                     F.greatest("cid", "did").alias("id_b"),
                     F.round("cos_raw", 6).alias("cosine")))
    d_a = d.select(F.col("did").alias("id_a"), F.col("dv").alias("va"),
                   F.col("dn").alias("na"), F.col("cell").alias("ca"))
    d_b = d.select(F.col("did").alias("id_b"), F.col("dv").alias("vb"),
                   F.col("dn").alias("nb"), F.col("cell").alias("cb"))
    within = (d_a.join(d_b, (F.col("ca") == F.col("cb"))
                       & (F.col("id_a") < F.col("id_b")))
              .withColumn("cos_raw", V.cosine_from_norms(
                  F.col("va"), F.col("vb"), F.col("na"), F.col("nb")))
              .filter(F.col("cos_raw") >= threshold)
              .select("id_a", "id_b", F.round("cos_raw", 6).alias("cosine")))
    # disjoint branches (cross has exactly one corpus member, within has
    # none) — no distinct needed
    return within.unionByName(cross)


def _centroid_literal(centroid_rows: list[tuple[int, list[float]]]):
    """Driver-side centroid table as TWO flat literal columns (cells:
    ``array<int>``, centroids: ``array<array<double>>``) zipped into
    structs. ``F.lit`` on the nested list produces a single Literal
    node, so plan analysis cost is independent of n_cells·dim — a
    per-element ``F.array(F.lit(...)...)`` tree costs ~1k expression
    nodes per use and dominates iteration time. A few KB of constants
    shipped with the plan — no join, no broadcast exchange."""
    cells = V.lit_nested([int(c) for c, _ in centroid_rows])
    cents = V.lit_nested([[float(x) for x in vec] for _, vec in centroid_rows])
    return F.zip_with(cells, cents,
                      lambda c, v: F.struct(c.alias("cell"), v.alias("centroid")))


def _nearest_cells_expr(vec, cent_arr, n: int = 1, by: str = "l2"):
    """Array of the ``n`` nearest cell ids for one vector against ANY
    ``array<struct<cell,centroid>>`` column expression (a plan literal
    or a broadcast-joined data column — the two centroid-distribution
    tiers share this exact argmin, which is what makes them bit-equal):
    transform to ``(distance, cell)`` structs, ``array_sort`` (distance
    asc, cell asc tie-break), slice. Zero shuffle, zero window."""
    if by == "ip":
        dist = lambda c: -V.dot(vec, c["centroid"])
    else:
        dist = lambda c: V.l2_distance(vec, c["centroid"])
    pairs = F.transform(cent_arr,
                        lambda c: F.struct(dist(c).alias("d"),
                                           c["cell"].alias("cell")))
    return F.transform(F.slice(F.array_sort(pairs), 1, n), lambda p: p["cell"])


def nearest_cells(vec, centroid_rows: list[tuple[int, list[float]]],
                  n: int = 1, by: str = "l2"):
    """Array of the ``n`` nearest cell ids for one vector, computed
    PER ROW over the literal centroid array — the scale-safe
    replacement for the crossJoin+row_number argmin the round-1 verdict
    flagged (it shuffled corpus×n_cells rows per use).

    ``by='l2'`` ranks by euclidean distance; ``by='ip'`` by (negated)
    inner product — the latter is bit-reproducible in DuckDB via
    ``list_dot_product``, which makes fixed-centroid assignment fully
    SQL-oracle-able.

    Model-size ceiling: the literal array ships n_cells·dim doubles
    INSIDE the plan — a few KB at small models, but a production IVF
    (n_cells ≈ 2^14–2^17 × 1k dims) would hand the analyzer a
    ~250 MB plan. Past a few hundred cells use the broadcast-data
    tier (:func:`assign_cells_joined` / :func:`with_nearest_cells_joined`),
    which ships the same array as a broadcast ROW instead."""
    return _nearest_cells_expr(vec, _centroid_literal(centroid_rows), n, by)


def centroid_frame(spark, centroid_rows: list[tuple[int, list[float]]]) -> DataFrame:
    """Driver-side centroid list as a (cell int, centroid
    array<double>) DataFrame — the model-as-data form the broadcast
    tier joins. In production this is simply the trained-centroid
    table read from storage; no driver literal ever holds it."""
    return local_frame(
        spark, [(int(c), [float(x) for x in vec]) for c, vec in centroid_rows],
        "cell int, centroid array<double>")


def with_nearest_cells_joined(df: DataFrame, centroids: DataFrame,
                              vec_col: str, out_col: str,
                              n: int = 1, by: str = "l2") -> DataFrame:
    """``out_col`` = array of the ``n`` nearest cell ids per row, with
    the centroid model delivered as BROADCAST DATA instead of a plan
    literal (round-10 verdict item 2 — the production-model-size tier):
    the centroid frame is collapsed to ONE row holding the sorted
    ``array<struct<cell,centroid>>``, broadcast, and joined on a
    constant key. Catalyst constant-folds the key and plans a
    BroadcastNestedLoopJoin with a SINGLE build row — the right
    physical shape: one broadcast variable, zero shuffle on the probe
    side, zero per-row fan-out (each corpus row meets exactly one
    build row), no hash table needed. The SAME argmin
    expression the literal tier uses then runs per row. Bit-equal to
    :func:`nearest_cells` on the same centroid set (pytest-pinned):
    the collect_list order is normalized by array_sort and the
    (distance, cell) ranking is order-independent anyway.

    Plan cost is O(1) in model size — n_cells·dim doubles travel in a
    broadcast variable, never through the analyzer — so this is the
    form that survives n_cells ≈ 2^15 × 1k dims, where the literal
    tier's ~250 MB plan would kill the driver. Crossover measured in
    SCALING.md (the literal tier stays marginally cheaper only while
    the model is a few KB)."""
    one = (centroids.groupBy().agg(
        F.array_sort(F.collect_list(F.struct(
            F.col("cell").cast("int").alias("cell"),
            F.col("centroid").alias("centroid")))).alias("__cents"))
        .withColumn("__ck", F.lit(1)))
    joined = (df.withColumn("__ck", F.lit(1))
              .join(F.broadcast(one), "__ck")
              .drop("__ck"))
    return (joined.withColumn(
        out_col,
        _nearest_cells_expr(F.col(vec_col), F.col("__cents"), n, by))
        .drop("__cents"))


def assign_cells_joined(corpus: DataFrame, centroids: DataFrame,
                        c_vec: str = "embedding", by: str = "l2",
                        out_col: str = "cell") -> DataFrame:
    """Broadcast-data twin of :func:`assign_cells`: tag every corpus
    row with its nearest centroid cell, with the model joined as data
    (see :func:`with_nearest_cells_joined`). Bit-equal output; the
    plan no longer embeds the model."""
    tagged = with_nearest_cells_joined(corpus, centroids, c_vec,
                                       "__nc", 1, by)
    return (tagged.withColumn(out_col, F.element_at("__nc", 1))
            .drop("__nc"))


def assign_cells(corpus: DataFrame, centroid_rows: list[tuple[int, list[float]]],
                 c_vec: str = "embedding", by: str = "l2",
                 out_col: str = "cell") -> DataFrame:
    """Tag every corpus row with its nearest centroid cell — a narrow
    per-row projection (map-only stage). At 100 TB this runs once at
    write time and the corpus parquet is partitioned by ``cell``."""
    return corpus.withColumn(
        out_col, F.element_at(nearest_cells(F.col(c_vec), centroid_rows, 1, by), 1))


def train_ivf_centroids(corpus: DataFrame, n_cells: int = 16,
                        c_id: str = "vec_id", c_vec: str = "embedding",
                        iterations: int = 2,
                        max_share: float | None = None,
                        return_stats: bool = False,
                        joined_assign: bool | None = None):
    """K-means-ish coarse quantizer: seed cells by id hash, then Lloyd
    iterations of assign (per-row literal-centroid argmin, map-only)
    + re-center (one groupBy per iteration). No corpus-wide window, no
    crossJoin — the only shuffle per iteration is the n_cells-group
    aggregate.

    Centroids are COLLECTED to the driver after every iteration
    (n_cells·dim doubles — a few KB, bounded) and re-embedded as plan
    literals: state lives on the driver, data never leaves executors,
    and each iteration's plan stays flat instead of nesting the
    previous iteration's plan inside it.

    ``max_share`` is the occupancy-aware training hook (round-8
    verdict item 8): per-cell MASS rides the same (cell, pos)
    aggregate every iteration (zero extra jobs), and after each
    iteration any cell holding more than ``max_share`` of the corpus
    is SPLIT — its centroid replaced by two seeds, the cell's own
    min-id and max-id member vectors (one bounded min_by/max_by
    aggregate over the hot cells; 2 collected rows per split,
    deterministic on any engine). The next iteration's assignment
    separates the split mass; if the FINAL scheduled iteration split,
    refinement passes continue until one completes with no split (cap
    8 extra passes — the stats tail records the observed shares of
    the RETURNED centroids either way, so a cap hit is visible, never
    silent). Fix the imbalance where it is created, so the downstream
    occupancy guard (subsplit_hot_cells) has nothing to mop up. Cell
    ids are renumbered 0..k-1 after a split (ids are
    training-internal labels; only the final list is the contract).

    ``return_stats=True`` additionally returns the per-iteration mass
    diagnostic: a list (one entry per completed assignment pass) of
    {cell: share} dicts, so training imbalance is observable, not
    inferred."""
    def _centroids_of(frame: DataFrame):
        # posexplode + one (cell, pos) aggregate instead of `dim`
        # separate avg(element_at) expressions: the same answer with a
        # plan whose size is independent of the vector dimension —
        # per-iteration compile cost stays flat as dim grows. Count
        # rides the same aggregate: rows-per-(cell,pos) is the cell's
        # occupancy (every member contributes one element per pos).
        rows = (frame.select("cell", F.posexplode(F.col(c_vec)).alias("pos", "x"))
                .groupBy("cell", "pos")
                .agg(F.avg("x").alias("m"), F.count(F.lit(1)).alias("n"))
                .collect())
        acc: dict[int, dict[int, float]] = {}
        mass: dict[int, int] = {}
        for r in rows:
            acc.setdefault(int(r["cell"]), {})[int(r["pos"])] = float(r["m"])
            mass[int(r["cell"])] = int(r["n"])
        cents = sorted((cell, [d[p] for p in sorted(d)])
                       for cell, d in acc.items())
        return cents, mass

    def _split_hot(assigned: DataFrame, centroids, mass):
        total = sum(mass.values())
        if not total:
            return centroids, {}
        shares = {c: m / total for c, m in mass.items()}
        hot = sorted(c for c, s in shares.items() if s > max_share)
        if not hot:
            return centroids, shares
        # two deterministic member seeds per hot cell: the min-id and
        # max-id members' vectors — one bounded aggregate, 2 rows per
        # hot cell collected (min_by/max_by tie-free: ids are unique)
        seeds = {r["cell"]: (list(r["lo"]), list(r["hi"]))
                 for r in (assigned.filter(F.col("cell").isin(hot))
                           .groupBy("cell")
                           .agg(F.min_by(c_vec, c_id).alias("lo"),
                                F.max_by(c_vec, c_id).alias("hi"))
                           .collect())}
        out = []
        for cell, vec in centroids:
            if cell in seeds:
                lo, hi = seeds[cell]
                out.append(lo)
                if lo != hi:  # single-member cell cannot split
                    out.append(hi)
            else:
                out.append(vec)
        return [(i, v) for i, v in enumerate(out)], shares

    def _assign(centroids):
        # centroid-distribution tier: plan literals while the model is
        # a few KB, the broadcast-data join past a few hundred cells
        # (production IVF wants n_cells ≈ √N — a 2^15-cell literal is
        # a ~250 MB plan; the two tiers are bit-equal, pytest-pinned).
        # joined_assign=None auto-switches; True/False forces a tier.
        use_joined = (len(centroids) > 256 if joined_assign is None
                      else joined_assign)
        if use_joined:
            return assign_cells_joined(
                corpus, centroid_frame(corpus.sparkSession, centroids),
                c_vec)
        return assign_cells(corpus, centroids, c_vec)

    stats: list[dict[int, float]] = []
    centroids, _ = _centroids_of(
        corpus.select(c_id, c_vec, (F.col(c_id) % n_cells).alias("cell")))
    did_split = False
    for _ in range(iterations):
        assigned = _assign(centroids)
        centroids, mass = _centroids_of(assigned)
        if max_share is not None:
            new_c, shares = _split_hot(assigned, centroids, mass)
            did_split = new_c != centroids
            centroids = new_c
            stats.append(shares)
        else:
            total = sum(mass.values())
            stats.append({c: m / total for c, m in mass.items()}
                         if total else {})
    # A split in the FINAL iteration leaves raw member seeds in the
    # returned list with no assignment pass run against them — the
    # docstring's bound would be asserted, not enforced (review
    # finding). Refine until a pass completes with no split (bounded:
    # each extra pass only runs because the previous one split, and
    # splits strictly increase the cell count, itself bounded by the
    # refusal in _split_hot's caller contract); the final stats entry
    # is then an OBSERVED share table for the returned centroids.
    extra = 0
    while max_share is not None and did_split and extra < 8:
        extra += 1
        assigned = _assign(centroids)
        centroids, mass = _centroids_of(assigned)
        new_c, shares = _split_hot(assigned, centroids, mass)
        did_split = new_c != centroids
        centroids = new_c
        stats.append(shares)
    if return_stats:
        return centroids, stats
    return centroids


def ivf_topk(queries: DataFrame, corpus_assigned: DataFrame,
             centroid_rows: list[tuple[int, list[float]]],
             k: int = 10, nprobe: int = 4, q_id: str = "q_id", q_vec: str = "q_vec",
             c_id: str = "vec_id", c_vec: str = "embedding",
             by: str = "l2") -> DataFrame:
    """Probe the ``nprobe`` nearest cells per query (per-row literal
    argmin — no crossJoin, no window on the query side), exact cosine
    rerank inside the probed cells. ``corpus_assigned`` must carry a
    ``cell`` column (write-time layout: partition the corpus parquet by
    cell, so the probe join prunes partitions). The probe join is
    hint-free — AQE broadcasts a small probe set on its own, and a
    corpus-derived (linearly scaling) query frame degrades to a
    shuffle join on ``cell`` instead of an unconditional broadcast."""
    probes = (queries
              .withColumn("cell", F.explode(
                  nearest_cells(F.col(q_vec), centroid_rows, nprobe, by)))
              .withColumn("__qn", V.norm(F.col(q_vec)))
              .select(q_id, q_vec, "__qn", "cell"))
    scored = (corpus_assigned.withColumn("__cn", V.norm(F.col(c_vec)))
              .join(probes, on="cell")
              .withColumn("cosine", V.cosine_from_norms(
                  F.col(c_vec), F.col(q_vec), F.col("__cn"), F.col("__qn"))))
    return _topk_output(scored, q_id, c_id, k)


def ivf_topk_joined(queries: DataFrame, corpus_assigned: DataFrame,
                    centroids: DataFrame,
                    k: int = 10, nprobe: int = 4,
                    q_id: str = "q_id", q_vec: str = "q_vec",
                    c_id: str = "vec_id", c_vec: str = "embedding",
                    by: str = "l2") -> DataFrame:
    """:func:`ivf_topk` with the probe argmin fed by the BROADCAST
    centroid frame instead of the plan literal — the serving half of
    the production-model-size tier (the corpus side already reads a
    stored ``cell`` column either way). Bit-equal to :func:`ivf_topk`
    on the same centroid set; plan cost O(1) in n_cells·dim."""
    probes = (with_nearest_cells_joined(queries, centroids, q_vec,
                                        "__pc", nprobe, by)
              .withColumn("cell", F.explode("__pc"))
              .withColumn("__qn", V.norm(F.col(q_vec)))
              .select(q_id, q_vec, "__qn", "cell"))
    scored = (corpus_assigned.withColumn("__cn", V.norm(F.col(c_vec)))
              .join(probes, on="cell")
              .withColumn("cosine", V.cosine_from_norms(
                  F.col(c_vec), F.col(q_vec), F.col("__cn"), F.col("__qn"))))
    return _topk_output(scored, q_id, c_id, k)


def subsplit_hot_cells(assigned: DataFrame, cap: int,
                       c_id: str = "vec_id", c_vec: str = "embedding",
                       cell_col: str = "cell", on_hot: str = "subsplit",
                       oversample: int = 8,
                       max_seeds: int = 4096) -> DataFrame:
    """Hot-cell guard for within-cell pair generation (round-8 verdict
    item 1 — the one structural 100 TB hazard left): pair emission
    inside a cell is O(m²) in occupancy m, and k-means cells on real
    web embeddings skew badly — one cell holding 10% of the corpus
    makes its pair set ~(0.1n)² with a plan that LOOKS linear. This
    reacts to the DATA, not the plan: cells over ``cap`` members are
    sub-split against sub-centroids seeded from the cell's OWN members,
    so downstream pairing keys on (cell, subcell) and within-key
    occupancy drops by ~n_sub.

    Returns ``assigned`` plus a ``subcell`` column (0 for members of
    non-hot cells). ``on_hot="error"`` is the documented descriptive
    refusal instead: raise with the hot cells, their occupancies and
    exact pair counts, so an operator decides (re-train the quantizer
    with ``train_ivf_centroids(max_share=...)``, raise the cap, or
    accept the sub-split recall tradeoff).

    Determinism + scale shape, step by step:

    1. Per-cell counts: ONE aggregate on the cell key (the same key the
       pair join shuffles on), collected — bounded by n_cells.
    2. Per hot cell, ``n_sub = ceil(m / cap)`` sub-centroids are seeded
       from the cell's members. Selection must be deterministic AND
       bounded: a plain per-cell ``row_number`` over the hot cell is
       itself an O(m log m) single-task sort of the hot cell, so seeds
       come from a HASH-GATED candidate pool first — the portable md5
       gate (functions/text.py:hash64 — the exact gate the stratified
       sampler uses, so a SQL oracle replays it verbatim) keeps
       ~``oversample``·n_sub candidates per cell (map-only filter),
       then the n_sub smallest ids among candidates (window over the
       small pool) become sub-centroids, sub index = rank. A cell
       whose gate catches fewer than n_sub candidates keeps what it
       caught (P(zero) ≈ e^-oversample·n_sub — it then stays unsplit);
       the gate threshold is integer arithmetic end-to-end.
    3. Seeds are collected (Σ n_sub rows ≤ ``max_seeds``, raised
       loudly otherwise — driver model state stays bounded like the
       IVF centroid collects) and re-embedded as plan LITERALS; the
       sub-assignment is a map-only per-row argmin by inner product
       over the row's own cell's seeds (``F.filter`` on the literal
       struct array — zero shuffle, zero join), tie-break by sub index
       ascending. Non-hot rows see an empty filtered array → 0.

    Recall contract: pairs crossing a subcell boundary are LOST — the
    same accepted, bounded recall loss as SemDeDup's own cell
    boundaries (cross-cell near-dups), now applied one level down, and
    the price of turning a quadratic hot key back into bounded work.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    # validate BEFORE the no-hot-cells early return: a typo'd on_hot
    # must fail on every run, not only on the production run where a
    # hot cell finally appears (review finding)
    if on_hot not in ("subsplit", "error"):
        raise ValueError(f"on_hot must be 'subsplit' or 'error', "
                         f"got {on_hot!r}")
    from cati_database_feeder_spark.functions import text as TX
    from cati_database_feeder_spark.operators.sampling import GRAIN

    counts = {r[cell_col]: r["m"]
              for r in assigned.groupBy(cell_col)
              .agg(F.count(F.lit(1)).alias("m")).collect()}
    hot = {c: m for c, m in counts.items() if m > cap}
    if not hot:
        return assigned.withColumn("subcell", F.lit(0))
    if on_hot == "error":
        detail = ", ".join(
            f"cell {c}: occupancy {m} -> {m * (m - 1) // 2} pairs"
            for c, m in sorted(hot.items()))
        raise ValueError(
            f"hot-cell occupancy guard: {len(hot)} cell(s) exceed "
            f"cap={cap} and within-cell pairing is quadratic in "
            f"occupancy ({detail}); sub-split them "
            f"(on_hot='subsplit'), raise the cap, or retrain the "
            f"quantizer with train_ivf_centroids(max_share=...)")

    n_sub = {c: (m + cap - 1) // cap for c, m in hot.items()}
    total_seeds = sum(n_sub.values())
    if total_seeds > max_seeds:
        raise ValueError(
            f"subsplit_hot_cells: {total_seeds} sub-centroids exceed "
            f"max_seeds={max_seeds} (driver model state is bounded by "
            f"design) — raise the cap, retrain the quantizer, or raise "
            f"max_seeds deliberately")
    # integer gate threshold: ceil(GRAIN * oversample * n_sub / m),
    # capped at GRAIN (gate everything when the cell is barely hot)
    thr = {c: min(GRAIN, (GRAIN * oversample * n_sub[c] + hot[c] - 1)
                  // hot[c]) for c in hot}
    thr_col = F.lit(-1)
    nsub_col = F.lit(0)
    for c in sorted(hot):
        thr_col = F.when(F.col(cell_col) == c, F.lit(thr[c])).otherwise(thr_col)
        nsub_col = F.when(F.col(cell_col) == c, F.lit(n_sub[c])).otherwise(nsub_col)
    bucket = TX.hash64(F.col(c_id).cast("string")) % GRAIN
    w = Window.partitionBy(cell_col).orderBy(c_id)
    seed_rows = (assigned
                 .filter(bucket < thr_col)
                 .select(cell_col, c_id, c_vec, nsub_col.alias("__ns"))
                 .withColumn("__rn", F.row_number().over(w))
                 .filter(F.col("__rn") <= F.col("__ns"))
                 .select(cell_col, "__rn", c_vec)
                 .collect())
    if not seed_rows:
        return assigned.withColumn("subcell", F.lit(0))
    # Seeds indexed BY CELL through one element_at on per-cell 2-D/3-D
    # literals — NOT a filter over an all-seeds struct array keyed by
    # ``s["cell"] == col(cell)``. The filter form references the cell
    # column INSIDE a lambda: syntactically once (so CollapseProject
    # happily inlines the full argmin-over-centroids expression that
    # computes ``cell``), but evaluated once PER SEED ELEMENT at
    # runtime — the assignment argmin re-ran ~|seeds| times per row,
    # and the join-key ``isnotnull(subcell)`` pushdown duplicated the
    # whole tree into the scan filter on top of that (measured: 30.7 s
    # for 2000 rows at sf0.1; this form: 0.9 s, identical output).
    # Here ``cell`` is referenced only by the __subidx when-chain —
    # more than once and outside any lambda, which both blocks the
    # project collapse (argmin evaluates once per row) and bounds the
    # per-row HOF work to the row's OWN cell's seeds.
    from collections import defaultdict
    by_cell: dict = defaultdict(list)
    for r in seed_rows:
        by_cell[r[cell_col]].append(
            (int(r["__rn"]), [float(x) for x in r[c_vec]]))
    hot_sorted = sorted(by_cell)
    # trailing EMPTY entry = the non-hot sentinel: rows of cells with no
    # seeds index it, ride zip_with([],[]) → [] → F.get(...) null →
    # coalesce 0. Arrays are never NULL anywhere in the chain (a null
    # array into zip_with/array_sort NPEs in generated code), and the
    # sentinel keeps element_at in bounds under ANSI semantics.
    subs_2d = V.lit_nested([[s for s, _ in sorted(by_cell[c])]
                            for c in hot_sorted] + [[]])
    vecs_3d = V.lit_nested([[v for _, v in sorted(by_cell[c])]
                            for c in hot_sorted] + [[]])
    idx = F.lit(len(hot_sorted) + 1)
    for i, c in enumerate(hot_sorted):
        idx = F.when(F.col(cell_col) == c, F.lit(i + 1)).otherwise(idx)
    staged = assigned.withColumn("__subidx", idx)
    ranked = F.zip_with(
        F.element_at(vecs_3d, F.col("__subidx")),
        F.element_at(subs_2d, F.col("__subidx")),
        lambda v, s: F.struct((-V.dot(F.col(c_vec), v)).alias("d"),
                              s.alias("sub")))
    # coalesce(..., 0) is non-nullable → no isnotnull(subcell) join-key
    # filter gets pushed below this projection (the pushed copy would
    # re-evaluate the whole tree per row); F.get is 0-based and
    # null-safe on the empty sentinel array
    subcell = F.coalesce(F.get(F.array_sort(ranked), F.lit(0))["sub"],
                         F.lit(0))
    return staged.withColumn("subcell", subcell).drop("__subidx")


def semdedup_pairs_guarded(corpus: DataFrame,
                           centroid_rows: list[tuple[int, list[float]]],
                           threshold: float = 0.9, cap: int = 1000,
                           by: str = "ip", c_id: str = "vec_id",
                           c_vec: str = "embedding",
                           on_hot: str = "subsplit",
                           oversample: int = 8,
                           assigned: DataFrame | None = None,
                           split: DataFrame | None = None) -> DataFrame:
    """:func:`semdedup_pairs` behind the hot-cell occupancy guard:
    cells over ``cap`` members are sub-split (:func:`subsplit_hot_cells`
    — deterministic member-seeded sub-centroids) and pairing keys on
    (cell, subcell), so no key's pair emission exceeds ~cap²-ish work
    regardless of how badly the quantizer's cells skew on real data.
    ``on_hot="error"`` turns the guard into the documented descriptive
    refusal. Same verify arithmetic as :func:`semdedup_pairs`.
    ``split`` injects a precomputed (persisted/materialized)
    sub-split assignment — the 100 TB shape, where (cell, subcell) is
    the write-time layout computed once per corpus snapshot next to
    the cell assignment itself; when given, ``assigned``/
    ``centroid_rows`` are not consulted and the guard's two
    driver-side jobs (occupancy count, seed selection) are skipped."""
    from cati_database_feeder_spark.operators.dedup import _bucket_pairs
    # persist the assignment unless the caller supplies one (a staged/
    # materialized assignment — the 100 TB write-time layout): FOUR
    # passes consume it (the guard's occupancy-count job, the
    # seed-selection job, and both sides of the candidate self-join)
    # and each would re-run the per-row centroid argmin; rows are
    # (id, vec, cell) — the same cheap-cache flat shape as the jaccard
    # shingle frame (measured: 7.1 → 5.9 s warm at sf0.1). Eviction
    # recomputes (persist, not checkpoint); the block is released by
    # the ContextCleaner when the plan is GC'd, the same lifecycle as
    # queryset's shared stages.
    own_persist = split is None and assigned is None
    if own_persist:
        assigned = assign_cells(corpus, centroid_rows, c_vec, by).persist()
    if split is None:
        try:
            split = subsplit_hot_cells(assigned, cap, c_id, c_vec,
                                       on_hot=on_hot,
                                       oversample=oversample)
        except BaseException:
            # the on_hot='error' refusal (or any guard failure) must
            # not leave our own corpus-sized persisted block pinned
            # with no result to justify it (review finding); a
            # caller-supplied `assigned` is the caller's to manage
            if own_persist:
                assigned.unpersist()
            raise
    cands = _bucket_pairs(
        split.select(F.col(c_id).alias("id"), "cell", "subcell"),
        ["cell", "subcell"], "id")
    v_a = corpus.select(F.col(c_id).alias("id_a"), F.col(c_vec).alias("va"),
                        V.norm(F.col(c_vec)).alias("na"))
    v_b = corpus.select(F.col(c_id).alias("id_b"), F.col(c_vec).alias("vb"),
                        V.norm(F.col(c_vec)).alias("nb"))
    return (cands.join(v_a, "id_a").join(v_b, "id_b")
            .withColumn("cos_raw", V.cosine_from_norms(
                F.col("va"), F.col("vb"), F.col("na"), F.col("nb")))
            .filter(F.col("cos_raw") >= threshold)
            .select("id_a", "id_b", F.round("cos_raw", 6).alias("cosine")))


def ivf_topk_quantized(queries: DataFrame, corpus_codes: DataFrame,
                       corpus_vec: DataFrame,
                       centroid_rows: list[tuple[int, list[float]]],
                       lo: float, hi: float, k: int = 10, nprobe: int = 4,
                       rerank: int = 50, q_id: str = "q_id",
                       q_vec: str = "q_vec", c_id: str = "vec_id",
                       codes_col: str = "codes", c_vec: str = "embedding",
                       by: str = "ip") -> DataFrame:
    """IVF serving on the int8-QUANTIZED store (round-8 verdict item 3
    — the consumer that realizes quantize_int8's 4× memory/IO cut):
    the coarse scan touches ONLY the code store, floats are fetched
    for the rerank survivors.

    Two-stage shape:

    1. Coarse, int8-resident: probe the ``nprobe`` nearest cells per
       query (per-row literal argmin, map-only), score candidates by
       cosine over the MIDPOINT-DEQUANTIZED codes
       (functions/vectors.py:dequantize_int8 — deterministic IEEE
       double HOFs, no Python), keep the top ``rerank`` per query
       (deterministic tie-break on id). At 100 TB the code store is
       the thing that fits: 1 byte/dim instead of 8, parquet
       partitioned by cell like the float store, so the probe join
       prunes the same partitions while reading an eighth of the
       bytes.
    2. Exact rerank: survivors join the FLOAT store BY ID —
       ``rerank × |Q|`` rows of float vectors move, never the corpus —
       exact cosine, top ``k``.

    ``lo``/``hi`` are the corpus-global quantization range: two
    driver-side doubles (the same bounded model state as the centroid
    literals). Recall is gated, not assumed —
    ``ivf_quantized_recall_check`` hash-pins mean recall@k vs exact
    brute force, the contract that catches a quantizer (or range)
    regression as a value mismatch."""
    probes = (queries
              .withColumn("cell", F.explode(
                  nearest_cells(F.col(q_vec), centroid_rows, nprobe, by)))
              .withColumn("__qn", V.norm(F.col(q_vec)))
              .select(q_id, q_vec, "__qn", "cell"))
    deq = V.dequantize_int8(F.col(codes_col), F.lit(float(lo)),
                            F.lit(float(hi)))
    coarse = (corpus_codes
              .withColumn("__deq", deq)
              .withColumn("__dn", V.norm(F.col("__deq")))
              .join(probes, on="cell")
              .withColumn("approx", V.cosine_from_norms(
                  F.col("__deq"), F.col(q_vec), F.col("__dn"), F.col("__qn"))))
    survivors = _two_level_rank(
        coarse.select(q_id, c_id, "approx"), q_id,
        [F.desc("approx"), F.asc(c_id)], rerank,
        rank_col="__r").select(q_id, c_id)
    qv = queries.withColumn("__qn", V.norm(F.col(q_vec)))
    cv = corpus_vec.select(F.col(c_id), F.col(c_vec),
                           V.norm(F.col(c_vec)).alias("__cn"))
    scored = (survivors.join(cv, c_id).join(qv, q_id)
              .withColumn("cosine", V.cosine_from_norms(
                  F.col(c_vec), F.col(q_vec), F.col("__cn"), F.col("__qn"))))
    w2 = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(c_id))
    return (scored.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select(q_id, F.col(c_id),
                    F.round("cosine", 6).alias("cosine"), "rank"))


def lsh_topk_multiprobe(queries: DataFrame, corpus: DataFrame,
                        hyperplanes: list[list[float]], k: int = 10,
                        n_flip: int = 2, q_id: str = "q_id",
                        q_vec: str = "q_vec", c_id: str = "vec_id",
                        c_vec: str = "embedding") -> DataFrame:
    """Multi-probe LSH top-k (Lv et al. 2007, extension E56): each
    query probes its own bucket PLUS the ``n_flip`` buckets reached by
    flipping the sign bits with the smallest margin |⟨v, h_i⟩| (ties
    by bit index) — the perturbations most likely to hide true
    neighbors. The standard way to buy recall WITHOUT more tables:
    L-tables amplification multiplies the corpus-side signature rows
    by L (storage/shuffle), multi-probe multiplies only the QUERY side
    by 1 + n_flip — at 100 TB the corpus keeps one signature row per
    vector and the probe explode is bounded by the query set.

    Candidate generation stays an equi-join on the bucket key (probe
    buckets are distinct single-bit flips, and a corpus vector lives
    in exactly one bucket, so candidates need no dedup); exact cosine
    rerank with the deterministic (cosine desc, id asc) tie-break.
    Everything is sequential-fold dot arithmetic over literal planes —
    bit-reproducible against a SQL oracle, same as lsh_topk.

    HOF-lambda note (the subsplit_hot_cells lesson): the flip lambda
    references the base-bucket EXPRESSION per probe element, which
    re-evaluates its n_bits sign dots n_flip more times — bounded and
    query-side only (total ≤ (2 + n_flip)·n_bits dots per query row),
    unlike the corpus-side per-seed argmin that motivated the staged
    form there."""
    n_bits = len(hyperplanes)
    if not 0 <= n_flip <= n_bits:
        raise ValueError(f"n_flip must be in [0, {n_bits}], got {n_flip}")
    planes = V.lit_nested([[float(x) for x in p] for p in hyperplanes])

    def bucket_of(vec_col_name: str):
        return F.array_join(F.transform(
            planes, lambda p: F.when(V.dot(F.col(vec_col_name), p) >= 0,
                                     F.lit("1")).otherwise(F.lit("0"))), "")

    # (|margin|, bit index) per plane, smallest margins first
    margins = F.array_sort(F.transform(
        planes, lambda p, i: F.struct(
            F.abs(V.dot(F.col(q_vec), p)).alias("a"),
            (i + 1).alias("i"))))
    flips = F.slice(margins, 1, n_flip)
    base = bucket_of(q_vec)
    probes = F.concat(
        F.array(base),
        F.transform(flips, lambda s: F.concat(
            F.substring(base, F.lit(1), s["i"] - 1),
            F.when(F.substring(base, s["i"], F.lit(1)) == "1",
                   F.lit("0")).otherwise(F.lit("1")),
            F.substring(base, s["i"] + 1, F.lit(n_bits)))))
    qb = (queries.withColumn("bucket", F.explode(probes))
          .withColumn("__qn", V.norm(F.col(q_vec))))
    cb = (corpus.withColumn("bucket", bucket_of(c_vec))
          .withColumn("__cn", V.norm(F.col(c_vec))))
    scored = (cb.join(qb, on="bucket")
              .withColumn("cosine", V.cosine_from_norms(
                  F.col(c_vec), F.col(q_vec), F.col("__cn"), F.col("__qn"))))
    return _topk_output(scored, q_id, c_id, k)


def jl_project(df: DataFrame, vec_col: str,
               planes: list[list[float]],
               out_col: str = "proj") -> DataFrame:
    """Johnson–Lindenstrauss random projection (extension E59):
    ``out[i] = ⟨v, r_i⟩`` over a seeded-Gaussian literal matrix
    (:func:`gaussian_hyperplanes` rows — JL needs only a random
    Gaussian matrix, and the constant 1/√d scale drops out of every
    cosine, so the planes are reused verbatim). One ``transform``
    over a single 2-D plane literal — the compiled-once form that
    fixed lsh_recall_check in round 8 — map-only, JVM-side, and each
    output element is one sequential-fold dot, so a SQL oracle
    replays the projected vectors bit-for-bit from the same
    literals."""
    pl = V.lit_nested([[float(x) for x in p] for p in planes])
    return df.withColumn(
        out_col, F.transform(pl, lambda p: V.dot(F.col(vec_col), p)))


def planes_frame(spark, planes: list[list[float]]) -> DataFrame:
    """Driver-side JL plane matrix as an (idx int, plane
    array<double>) DataFrame — the EXACT schema the ingest store's
    ``planes/`` table uses (streaming/ingest_embeddings.py), so a
    store-backed pipeline passes its planes table here directly."""
    return local_frame(
        spark, [(i, [float(x) for x in p]) for i, p in enumerate(planes)],
        "idx int, plane array<double>")


def jl_project_joined(df: DataFrame, planes: DataFrame, vec_col: str,
                      out_col: str = "proj") -> DataFrame:
    """:func:`jl_project` with the plane matrix delivered as BROADCAST
    DATA instead of a plan literal — the same model-size tier as
    :func:`assign_cells_joined` (E84), applied to the projection
    model: the planes frame is collapsed to one idx-ordered
    ``array<struct<idx,plane>>`` row, broadcast, joined on a constant
    key (single-build-row BroadcastNestedLoopJoin after constant
    folding), and the SAME sequential-fold dot runs per row — bit-
    equal to the literal form (pytest-pinned). At production dims a
    d'=32 × 4k-dim literal is ~1 MB of plan PER USE; here it is one
    broadcast variable. The literal form remains the SQL-oracle path
    (the oracle replays those literals)."""
    one = (planes.groupBy().agg(
        F.array_sort(F.collect_list(F.struct(
            F.col("idx").cast("int").alias("idx"),
            F.col("plane").alias("plane")))).alias("__planes"))
        .withColumn("__pk", F.lit(1)))
    joined = (df.withColumn("__pk", F.lit(1))
              .join(F.broadcast(one), "__pk").drop("__pk"))
    return (joined.withColumn(
        out_col, F.transform(F.col("__planes"),
                             lambda s: V.dot(F.col(vec_col), s["plane"])))
        .drop("__planes"))


def jl_topk(queries: DataFrame, corpus: DataFrame,
            planes: list[list[float]], k: int = 10, coarse_k: int = 100,
            q_id: str = "q_id", q_vec: str = "q_vec",
            c_id: str = "vec_id", c_vec: str = "embedding",
            corpus_proj: DataFrame | None = None,
            proj_col: str = "proj") -> DataFrame:
    """Approximate top-k through a Johnson–Lindenstrauss coarse tier:
    scan PROJECTED vectors (len(planes) dims instead of the full
    width) for each query's ``coarse_k`` nearest by projected cosine,
    then exact full-space rerank of only those candidates.

    This is the flat compressed-index serving shape: at 100 TB the
    projected copy is a separate narrow table (d'=32 of 64 dims = 2×
    smaller scan; on production 1k-4k-dim embeddings, 30-100×), the
    coarse scan touches ONLY that table, and the rerank fetches full
    vectors by an equi-join on the candidate ids — never the whole
    corpus. The coarse SCAN is corpus-linear per query by design
    (same class as brute_force_topk, which is the gate), but the
    coarse RANKING is a two-level top-k: each (query, partition)
    slice is pruned to its local top ``coarse_k`` before the final
    per-query rank runs over the bounded survivor union — no
    corpus-length single-task sort anywhere (round-9 verdict item 2;
    plan-pinned in tests). For sublinear candidate generation compose
    the projection with the IVF cell restriction (:func:`ivf_topk`)
    or LSH bucketing — the projection is an orthogonal compression
    axis, not a competitor.

    ``coarse_k`` is a FIXED serving budget, calibrated against the
    recall gate (``jl_recall_check``, queryset.py — the same contract
    lsh_recall_check holds for the LSH family) and re-calibrated when
    the corpus distribution shifts. A budget proportional to the
    corpus (``ceil(frac·n)``) keeps recall flat as n grows but makes
    the rerank join corpus-linear — the shape this operator exists to
    avoid; a fixed budget keeps rerank cost constant and surfaces any
    recall dilution in the gate instead of hiding it in the plan.

    Determinism: projected values are sequential-fold dots of plan
    literals; both ranking stages break ties on ascending id — an
    oracle replays the exact candidate set and the exact top-k.
    (Model-size note: the plane literal here is n_planes·dim doubles
    per use — fine at test dims, ~1 MB of plan at 32×4k. Past that,
    project through :func:`jl_project_joined` — bit-equal, broadcast
    data — and feed the result in via ``corpus_proj``; the planes
    stay SQL-oracle-able only on the literal path, which is why the
    registered queries keep it.)

    ``corpus_proj`` (optional): a PRE-PROJECTED corpus frame
    ``(c_id, proj_col)`` — e.g. the ingest-maintained store
    (streaming/ingest_embeddings.projected_serving_frames) — used for
    the coarse tier instead of projecting ``corpus`` in-plan. CALLER
    CONTRACT: its values must be jl_project outputs under the SAME
    ``planes`` passed here (the queries are projected under ``planes``
    in-plan; a matrix mismatch silently decorrelates the coarse
    cosines — recall collapses with no error, which is why the serving
    accessor returns the store's pinned planes alongside the frame).
    ``corpus`` still supplies the full-width vectors for the exact
    rerank."""
    qp = (jl_project(queries, q_vec, planes, "__qp")
          .withColumn("__qpn", V.norm(F.col("__qp"))))
    if corpus_proj is not None:
        # pre-projected corpus (e.g. the ingest-maintained proj store,
        # streaming/ingest_embeddings.projected_serving_frames): the
        # coarse tier reads the stored narrow column instead of
        # projecting the full vectors at serve time. Stored values are
        # jl_project outputs under the SAME plane literals, so the
        # result is bit-identical to the in-plan form (pinned by test).
        cp = (corpus_proj.select(c_id, F.col(proj_col).alias("__cp"))
              .withColumn("__cpn", V.norm(F.col("__cp"))))
    else:
        cp = (jl_project(corpus.select(c_id, c_vec), c_vec, planes, "__cp")
              .select(c_id, "__cp")
              .withColumn("__cpn", V.norm(F.col("__cp"))))
    coarse = (cp.crossJoin(qp.select(q_id, "__qp", "__qpn"))
              .withColumn("__ccos", V.cosine_from_norms(
                  F.col("__cp"), F.col("__qp"),
                  F.col("__cpn"), F.col("__qpn")))
              # slim to 3 narrow columns BEFORE any exchange: the
              # ranking needs only (query, id, score); shuffling the
              # projected vectors alongside would multiply the coarse
              # shuffle bytes by the projection width for nothing
              .select(q_id, c_id, "__ccos"))
    # Two-level top-k (round-9 verdict item 2, now the family-wide
    # :func:`_two_level_rank`): the single `row_number() OVER
    # (PARTITION BY q_id)` form funnels every corpus row for a query
    # through ONE task's sort — a per-query serialization point at
    # 10^11 vectors.
    cand = _two_level_rank(coarse, q_id,
                           [F.desc("__ccos"), F.asc(c_id)], coarse_k,
                           rank_col="__crank").select(q_id, c_id)
    full = (cand
            .join(corpus.select(c_id, c_vec), c_id)
            .join(queries.select(q_id, q_vec), q_id))
    scored = (full
              .withColumn("__cn", V.norm(F.col(c_vec)))
              .withColumn("__qn", V.norm(F.col(q_vec)))
              .withColumn("cosine", V.cosine_from_norms(
                  F.col(c_vec), F.col(q_vec),
                  F.col("__cn"), F.col("__qn"))))
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(c_id))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id, F.col(c_id),
                    F.round("cosine", 6).alias("cosine"), "rank"))


def semantic_decontaminate(corpus: DataFrame, bench: DataFrame,
                           threshold: float,
                           c_id: str = "vec_id", c_vec: str = "embedding",
                           b_id: str = "vec_id",
                           b_vec: str = "embedding") -> DataFrame:
    """Semantic (embedding-space) benchmark decontamination (extension
    E63): for every corpus vector, its max cosine against the benchmark
    embedding set, the arg-max benchmark id, and a contamination flag
    at ``threshold`` — the semantic sibling of the n-gram
    decontamination scrub (paraphrased eval leakage that shares no
    shingle). Zero-norm vectors are excluded on BOTH sides (cosine
    undefined).

    Scale shape: the benchmark side is BOUNDED (eval suites are MBs,
    not TBs) and broadcast; the corpus side is scanned ONCE with the
    per-benchmark-row expansion collapsed immediately by a partial-max
    aggregate (max of struct(cos, -bench_id) — map-side combine, one
    row per corpus vector into the shuffle; the struct tie-breaks
    equal cosines to the smallest bench id). NO per-corpus window
    anywhere. For benchmark sets too large for the row expansion,
    compose the JL/IVF coarse tier (:func:`jl_topk`, :func:`ivf_topk`)
    to prune candidates first — same contract, sublinear probe.

    Determinism: raw sequential-fold doubles order the arg-max in both
    engines; rounding to 6 happens only on output, and the flag is
    computed on the ROUNDED value so both engines compare the
    identical literal."""
    c = (corpus.select(F.col(c_id).alias("vec_id"),
                       F.col(c_vec).alias("__cv"))
         .withColumn("__cn", V.norm(F.col("__cv")))
         .filter(F.col("__cn") > 0))
    b = (bench.select(F.col(b_id).alias("__bid"),
                      F.col(b_vec).alias("__bv"))
         .withColumn("__bn", V.norm(F.col("__bv")))
         .filter(F.col("__bn") > 0))
    scored = (c.join(F.broadcast(b))
              .withColumn("__cos", V.cosine_from_norms(
                  F.col("__cv"), F.col("__bv"),
                  F.col("__cn"), F.col("__bn"))))
    # arg-max as MIN of struct(-cos, bench_id): negating the DOUBLE is
    # type-safe for any orderable id type (negating the id is not — a
    # string id would implicitly cast to NULL under non-ANSI and emit
    # best_bench_id NULL for every row; review finding), and min picks
    # the smallest id among equal cosines
    best = (scored.groupBy("vec_id")
            .agg(F.min(F.struct((-F.col("__cos")).alias("nc"),
                                F.col("__bid").alias("b"))).alias("__m")))
    return best.select(
        "vec_id",
        F.col("__m.b").alias("best_bench_id"),
        F.round(-F.col("__m.nc"), 6).alias("max_cos"),
        (F.round(-F.col("__m.nc"), 6) >= F.lit(float(threshold)))
        .alias("contaminated"))


def jl_ivf_topk(queries: DataFrame, corpus_assigned: DataFrame,
                centroid_rows: list[tuple[int, list[float]]],
                planes: list[list[float]], k: int = 10,
                nprobe: int = 4, coarse_k: int = 64,
                q_id: str = "q_id", q_vec: str = "q_vec",
                c_id: str = "vec_id", c_vec: str = "embedding",
                by: str = "ip") -> DataFrame:
    """The SUBLINEAR composition the JL docstring names (extension
    E78): IVF cell restriction × JL compression, orthogonal axes
    composed — candidate GENERATION is the cell equi-join (probe
    ``nprobe`` cells per query, so the coarse tier touches
    ~nprobe/n_cells of the corpus instead of all of it), and the
    candidate SCORING inside the probed cells reads the narrow
    projected vectors (30-100× fewer bytes on production dims). At
    100 TB both layouts are write-time artifacts of one table: corpus
    parquet partitioned by cell, with the projection as a sibling
    narrow column — the probe join prunes partitions (DPP) and the
    coarse scan prunes columns.

    Pipeline: per-query literal-argmin probe (map-only, no window) →
    projected-cosine scoring restricted by the cell join → the
    family-wide two-level top-k to ``coarse_k`` → exact full-width
    rerank of the bounded candidate set. Determinism: every score a
    sequential-fold dot of plan literals, both ranks id-tie-broken —
    an oracle replays candidates and top-k exactly. Recall is gated
    by ``jl_ivf_recall_check`` at the fixed (nprobe, coarse_k)
    budget, the same contract every serving tier here holds."""
    qp = (jl_project(queries, q_vec, planes, "__qp")
          .withColumn("__qpn", V.norm(F.col("__qp"))))
    probes = (qp.withColumn("cell", F.explode(
                  nearest_cells(F.col(q_vec), centroid_rows, nprobe, by)))
              .select(q_id, "__qp", "__qpn", "cell"))
    cp = (jl_project(corpus_assigned.select(c_id, c_vec, "cell"),
                     c_vec, planes, "__cp")
          .select(c_id, "cell", "__cp")
          .withColumn("__cpn", V.norm(F.col("__cp"))))
    coarse = (cp.join(probes, "cell")
              .withColumn("__ccos", V.cosine_from_norms(
                  F.col("__cp"), F.col("__qp"),
                  F.col("__cpn"), F.col("__qpn")))
              .select(q_id, c_id, "__ccos"))
    cand = _two_level_rank(coarse, q_id,
                           [F.desc("__ccos"), F.asc(c_id)], coarse_k,
                           rank_col="__crank").select(q_id, c_id)
    full = (cand
            .join(corpus_assigned.select(c_id, c_vec), c_id)
            .join(queries.select(q_id, q_vec), q_id))
    scored = (full
              .withColumn("__cn", V.norm(F.col(c_vec)))
              .withColumn("__qn", V.norm(F.col(q_vec)))
              .withColumn("cosine", V.cosine_from_norms(
                  F.col(c_vec), F.col(q_vec),
                  F.col("__cn"), F.col("__qn"))))
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(c_id))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id, F.col(c_id),
                    F.round("cosine", 6).alias("cosine"), "rank"))


# ---------------------------------------------------------------------
# Product quantization (E102): m-subspace codebooks, ADC serving
# ---------------------------------------------------------------------

def _pq_codebook_literal(codebooks: list[list[list[float]]]):
    """The [m][ks][dsub] codebook tensor as ONE plan literal
    (array<array<array<double>>>) — same single-Literal-node economics
    as :func:`_centroid_literal`. A PQ model is m·ks·dsub doubles
    (8·16·8 = 1 KB here; 8·256·128 = 2 MB at a production 1024-dim /
    8-bit setup) — small enough for the literal tier at test size;
    past a few hundred KB ship it like the centroid broadcast tier."""
    return V.lit_nested([[[float(x) for x in code] for code in sub]
                         for sub in codebooks])


def pq_codebooks_from_seeds(seed_vecs: list[list[float]],
                            m: int) -> list[list[list[float]]]:
    """Deterministic untrained codebooks: codebook[s][j] is the j-th
    seed vector's s-th subspace slice. With the seed set fixed (e.g.
    the first ks corpus vectors, the _cents16 discipline) every code
    and every ADC score is replayable in plain SQL — the value-checked
    twin of the trained path."""
    dim = len(seed_vecs[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [[[float(x) for x in v[s * dsub:(s + 1) * dsub]]
             for v in seed_vecs] for s in range(m)]


def _pq_code_expr(sub_vec, cb_sub):
    """Code for one subspace: argmax inner product against the
    subspace's codebook entries, smallest index on ties — the exact
    (-ip, j) struct-sort argmin :func:`_nearest_cells_expr` uses, so
    a SQL oracle replays it with ROW_NUMBER(ORDER BY ip DESC, j)."""
    pairs = F.transform(cb_sub, lambda c, j: F.struct(
        (-V.dot(sub_vec, c)).alias("d"), j.cast("int").alias("j")))
    return F.element_at(F.array_sort(pairs), 1)["j"]


def pq_encode(df: DataFrame, codebooks: list[list[list[float]]],
              vec_col: str = "embedding",
              out_col: str = "codes") -> DataFrame:
    """Tag every row with its PQ code word: ``out_col[s]`` = index of
    the s-th subspace codebook entry nearest (by inner product) to the
    vector's s-th slice. Map-only, zero shuffle — at 100 TB this runs
    once at write time and the m-byte codes column is stored next to
    (or instead of) the float vectors: dim·4 bytes → m bytes, a 32×
    cut at dim=64/m=8 (512× at production 1k dims)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    cb = _pq_codebook_literal(codebooks)
    v = F.col(vec_col)
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: _pq_code_expr(F.slice(v, s * dsub + 1, dsub),
                                F.element_at(cb, s + 1)))
    return df.withColumn(out_col, codes)


def _pq_lut_expr(q_vec, cb, m: int, dsub: int):
    """Per-query ADC lookup table: luts[s][j] = <q_s, codebook[s][j]>
    — m·ks doubles computed ONCE per query (map-only on the bounded
    query frame), so scoring a candidate is m array lookups + m adds,
    never a dim-length fold."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.transform(
            F.element_at(cb, s + 1),
            lambda c: V.dot(F.slice(q_vec, s * dsub + 1, dsub), c)))


def _pq_adc_score(codes_col, luts_col):
    """ADC score: Σ_s luts[s][codes[s]] as a fixed-order left fold
    from 0.0 — bit-reproducible (SQL replays it as
    CAST(0 AS DOUBLE) + t0 + ... + t{m-1})."""
    terms = F.zip_with(codes_col, luts_col,
                       lambda c, lut: F.element_at(lut, c + 1))
    return F.aggregate(terms, F.lit(0.0), lambda a, x: a + x)


def pq_adc_topk(queries: DataFrame, codes: DataFrame,
                codebooks: list[list[list[float]]], k: int = 10,
                q_id: str = "q_id", q_vec: str = "q_vec",
                c_id: str = "vec_id", codes_col: str = "codes",
                budget: int | None = None,
                corpus: DataFrame | None = None,
                c_vec: str = "embedding") -> DataFrame:
    """Asymmetric-distance (ADC) top-k over a PQ code table.

    The serving shape PQ buys at 100 TB: the coarse scan reads the
    m-byte ``codes`` column ONLY (32-512× fewer bytes than floats),
    each candidate costs m lookups into the query's precomputed LUT,
    and ranking is the family-standard two-level top-k — no
    corpus-length single-task sort. With ``budget`` + ``corpus`` set,
    the ADC scan keeps a FIXED ``budget`` of candidates per query and
    an exact float rerank (id equi-join fetch, same tail as jl_topk)
    emits the final top-k — the compressed tier never decides the
    final order, only the candidate set. Without them, the raw ADC
    ranking itself is returned (the value-checked form: every score is
    a fixed-order fold of literal-codebook dot products, so DuckDB
    replays codes, LUTs, scores, and ranks bit-for-bit).

    Compose with the IVF cell restriction for sublinearity — PQ
    compresses the scan, IVF shrinks it; production ANN (IVFADC) is
    exactly that composition."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    cb = _pq_codebook_literal(codebooks)
    ql = queries.select(q_id, q_vec).withColumn(
        "__luts", _pq_lut_expr(F.col(q_vec), cb, m, dsub))
    scored = (codes.select(c_id, codes_col)
              .crossJoin(ql.select(q_id, "__luts"))
              .withColumn("__adc",
                          _pq_adc_score(F.col(codes_col), F.col("__luts")))
              .select(q_id, c_id, "__adc"))
    if budget is None:
        ranked = _two_level_rank(scored, q_id,
                                 [F.desc("__adc"), F.asc(c_id)], k)
        return ranked.select(q_id, F.col(c_id),
                             F.round("__adc", 6).alias("adc"), "rank")
    if corpus is None:
        raise ValueError("budget set but no corpus to rerank from")
    cand = _two_level_rank(scored, q_id,
                           [F.desc("__adc"), F.asc(c_id)], budget,
                           rank_col="__crank").select(q_id, c_id)
    full = (cand.join(corpus.select(c_id, c_vec), c_id)
            .join(queries.select(q_id, q_vec), q_id))
    scored = (full.withColumn("__cn", V.norm(F.col(c_vec)))
              .withColumn("__qn", V.norm(F.col(q_vec)))
              .withColumn("cosine", V.cosine_from_norms(
                  F.col(c_vec), F.col(q_vec),
                  F.col("__cn"), F.col("__qn"))))
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(c_id))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id, F.col(c_id),
                    F.round("cosine", 6).alias("cosine"), "rank"))


def train_pq_codebooks(corpus: DataFrame, dim: int, m: int = 8,
                       ks: int = 16, c_id: str = "vec_id",
                       c_vec: str = "embedding",
                       iterations: int = 2) -> list[list[list[float]]]:
    """Per-subspace Lloyd training, all m subspaces in ONE distributed
    job per iteration (the train_ivf_centroids discipline applied to
    PQ): explode each vector into (s, subvec) rows once, assign codes
    per row against the literal codebook tensor (map-only), re-center
    with a single (s, code, pos) aggregate — m·ks·dsub collected rows
    per iteration (1 KB here), re-embedded as the next iteration's
    literals. Seeding is id % ks (deterministic); a code cell that
    loses all members keeps its previous entry."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    subs = (corpus.select(
        F.col(c_id).alias("__id"),
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.struct(
                s.cast("int").alias("s"),
                F.slice(F.col(c_vec), s * dsub + 1, dsub).alias("sv"))))
        .alias("e"))
        .select("__id", F.col("e.s").alias("s"), F.col("e.sv").alias("sv")))

    def _rebuild(frame: DataFrame, prev):
        rows = (frame.select("s", "code", F.posexplode("sv").alias("pos", "x"))
                .groupBy("s", "code", "pos")
                .agg(F.avg("x").alias("mu"))
                .collect())
        acc: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            acc.setdefault((int(r["s"]), int(r["code"])), {})[
                int(r["pos"])] = float(r["mu"])
        out = []
        for s in range(m):
            sub = []
            for j in range(ks):
                d = acc.get((s, j))
                sub.append([d[p] for p in sorted(d)] if d
                           else prev[s][j])
            out.append(sub)
        return out

    seeded = subs.withColumn("code", (F.col("__id") % ks).cast("int"))
    zero = [[[0.0] * dsub for _ in range(ks)] for _ in range(m)]
    books = _rebuild(seeded, zero)
    for _ in range(iterations):
        cb = _pq_codebook_literal(books)
        assigned = subs.withColumn(
            "code", _pq_code_expr(F.col("sv"),
                                  F.element_at(cb, F.col("s") + 1)))
        books = _rebuild(assigned, books)
    return books


def ivfpq_topk(queries: DataFrame, codes_assigned: DataFrame,
               corpus: DataFrame, codebooks: list[list[list[float]]],
               centroid_rows: list[tuple[int, list[float]]],
               k: int = 10, nprobe: int = 4, budget: int = 64,
               q_id: str = "q_id", q_vec: str = "q_vec",
               c_id: str = "vec_id", codes_col: str = "codes",
               c_vec: str = "embedding", by: str = "ip") -> DataFrame:
    """IVFADC (E107) — the production ANN composition (Jégou et al.,
    the faiss IVF-PQ shape): IVF cell restriction for candidate
    GENERATION (probe ``nprobe`` cells per query, touching
    ~nprobe/n_cells of the corpus) × PQ asymmetric-distance scoring
    for the candidates (the m-byte codes column, 32-512× fewer bytes
    than floats), then a FIXED ``budget`` of survivors per query and
    an exact full-width rerank. The two compressions are orthogonal:
    IVF shrinks the scan, PQ shrinks the bytes the surviving scan
    reads — at 100 TB the table is partitioned by cell with the codes
    as a sibling narrow column, the probe join prunes partitions
    (DPP) and ADC prunes bytes.

    ``codes_assigned``: (c_id, cell, codes) — the write-time layout
    frame (cell assignment and PQ codes are both ingest-time
    artifacts). Determinism: probes are literal-argmin, codes exact
    argmax, ADC a fixed-order fold, both ranks id-tie-broken — fully
    SQL-replayable under fixed codebooks/centroids; the trained form
    holds a recall gate instead (the family discipline)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    cb = _pq_codebook_literal(codebooks)
    ql = queries.select(q_id, q_vec).withColumn(
        "__luts", _pq_lut_expr(F.col(q_vec), cb, m, dsub))
    probes = (ql.withColumn("cell", F.explode(
                  nearest_cells(F.col(q_vec), centroid_rows, nprobe, by)))
              .select(q_id, "__luts", "cell"))
    coarse = (codes_assigned.select(c_id, "cell", codes_col)
              .join(probes, "cell")
              .withColumn("__adc",
                          _pq_adc_score(F.col(codes_col), F.col("__luts")))
              .select(q_id, c_id, "__adc"))
    cand = _two_level_rank(coarse, q_id,
                           [F.desc("__adc"), F.asc(c_id)], budget,
                           rank_col="__crank").select(q_id, c_id)
    full = (cand.join(corpus.select(c_id, c_vec), c_id)
            .join(queries.select(q_id, q_vec), q_id))
    scored = (full.withColumn("__cn", V.norm(F.col(c_vec)))
              .withColumn("__qn", V.norm(F.col(q_vec)))
              .withColumn("cosine", V.cosine_from_norms(
                  F.col(c_vec), F.col(q_vec),
                  F.col("__cn"), F.col("__qn"))))
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(c_id))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id, F.col(c_id),
                    F.round("cosine", 6).alias("cosine"), "rank"))
