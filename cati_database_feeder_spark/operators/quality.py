"""Corpus-level language-model quality signals (extension E52).

CCNet-style LM filtering scores each document by how "familiar" its
token transitions are under a model trained on the corpus itself —
boilerplate and fluent text score high, lorem-ipsum noise and OCR
garbage score low. A true smoothed-perplexity score needs per-bigram
``log()`` sums, and cross-engine float SUM ordering makes that
un-oracle-able bit-for-bit; this module keeps the signal and drops the
logs: every per-doc statistic is an exact BIGINT sum over corpus bigram
counts with ONE final division — the same integer-exactness discipline
as `text_unigram_rarity` (queryset.py) and the impact manifest.

Plan shape, built for 100 TB:
- bigram extraction is one ``arrays_zip`` of two shifted slices + an
  explode — map-only, output rows = corpus token count (linear);
- the corpus bigram model is ONE ``groupBy(w1, w2).count()`` — the
  shuffle is on the bigram key and AQE coalesces the skewed tail
  (stop-word bigrams are hot keys, but COUNT has map-side partial
  aggregation, so the hot key ships one partial row per map task,
  never its raw occurrences);
- scoring re-joins doc bigrams to the model on the SAME (w1, w2) key
  the count shuffle just produced, so the join reuses that
  partitioning; the final per-doc aggregate is a groupBy on doc_id.
No window over the corpus, no driver collect, nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cati_database_feeder_spark.functions import text as textfn


def bigram_familiarity(documents: DataFrame, rare_max: int = 2,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-document bigram-LM familiarity over lowercased whitespace
    tokens. For each doc with >= 2 tokens:

    - ``n_bigrams``  — the doc's bigram count (token count - 1);
    - ``fam_sum``    — exact BIGINT sum of corpus-wide occurrence
      counts of the doc's bigrams (self-inclusive: the model is
      trained on the full corpus, scored docs included — the standard
      CCNet arrangement scores with a model trained on the same crawl);
    - ``familiarity`` — fam_sum / n_bigrams, the mean corpus frequency
      of the doc's transitions (one final division of exact integers);
    - ``rare_frac``  — fraction of the doc's bigram OCCURRENCES whose
      corpus count is <= ``rare_max`` (novelty/garbage signal: high
      rare_frac at low familiarity flags unnatural token transitions).

    Docs with < 2 tokens have no transitions and are absent from the
    output (a quality gate treats them via the length filters in
    `quality_profile`, not here).
    """
    tk = (documents
          .select(F.col(id_col),
                  F.transform(textfn.tokens(F.col(text_col)),
                              F.lower).alias("tk"))
          .filter(F.size("tk") >= 2))
    n = F.size("tk")
    # adjacent pairs as one zip of two shifted slices (same single-pass
    # trick as shingles_from_tokens) — map-only, linear output
    bg = (tk.select(
            id_col,
            F.explode(F.arrays_zip(F.slice("tk", 1, n - 1),
                                   F.slice("tk", 2, n - 1))).alias("b"))
          .select(id_col, F.col("b")["0"].alias("w1"),
                  F.col("b")["1"].alias("w2")))
    model = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    return (bg.join(model, ["w1", "w2"])
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.sum("c").alias("fam_sum"),
                 F.sum(F.when(F.col("c") <= rare_max, F.lit(1))
                       .otherwise(F.lit(0))).alias("rare_occ"))
            .select(id_col, "n_bigrams", "fam_sum",
                    F.round(F.col("fam_sum")
                            / F.col("n_bigrams").cast("double"), 6)
                    .alias("familiarity"),
                    F.round(F.col("rare_occ")
                            / F.col("n_bigrams").cast("double"), 6)
                    .alias("rare_frac")))


def dsir_importance(documents: DataFrame, target_pred,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """DSIR-style importance score (extension E58; Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"),
    with the log-ratio dropped for integer exactness — the same
    discipline as :func:`bigram_familiarity`: every per-doc statistic
    is an exact BIGINT sum with ONE final division.

    DSIR weights each raw document by how target-like its n-gram
    distribution is: w(x) ∝ p_target(x) / p_raw(x) over hashed n-gram
    features. Here the feature is the lowercased whitespace unigram
    and the per-doc score is the occupancy-weighted target share

        importance = Σ_w c_target(w) / Σ_w c_all(w)

    summed over the doc's token OCCURRENCES, where ``c_target`` /
    ``c_all`` are corpus-wide occurrence counts of the word inside the
    target slice (rows matching ``target_pred``) and the full corpus.
    This is the ratio-of-means form of the DSIR weight: monotone in
    p_target/p_raw up to the global constant N_target/N_all, exact in
    BIGINT until the one division, so a SQL oracle replays it
    bit-for-bit. Docs with zero tokens have no occurrences and are
    absent from the output (the length gates in ``quality_profile``
    own that class).

    Plan shape, built for 100 TB:
    - ONE token explode (map-only, corpus-token-linear rows) carrying
      the precomputed target flag;
    - the vocab model is ONE ``groupBy(word)`` with two counting
      aggregates — map-side partials, hot stop-words ship one partial
      row per map task;
    - scoring re-joins occurrences to the model on the SAME word key
      that shuffle just produced, then one per-doc aggregate.
    DSIR's feature hashing exists to keep a *broadcastable* model;
    this plan joins the model instead of broadcasting it, so the
    un-hashed word key is already shuffle-scalable — hashing becomes
    an optimization knob (smaller model table), not a correctness
    requirement.
    """
    tk = (documents
          .select(F.col(id_col), target_pred.alias("__tgt"),
                  F.explode(F.transform(textfn.tokens(F.col(text_col)),
                                        F.lower)).alias("w")))
    vocab = (tk.groupBy("w")
             .agg(F.count(F.lit(1)).alias("c_all"),
                  F.sum(F.when(F.col("__tgt"), F.lit(1))
                        .otherwise(F.lit(0))).alias("c_tgt")))
    return (tk.join(vocab, "w")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum("c_tgt").alias("tgt_sum"),
                 F.sum("c_all").alias("all_sum"))
            .select(id_col, "n_tokens", "tgt_sum", "all_sum",
                    F.round(F.col("tgt_sum")
                            / F.col("all_sum").cast("double"), 6)
                    .alias("importance")))


def vocab_oov_rate(documents: DataFrame, vocab_size: int,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Vocabulary coverage score (extension E65, the tokenizer-prep
    measurement): build the top-``vocab_size`` token vocabulary by
    corpus occurrence count (ties broken by token ascending — the only
    deterministic LIMIT) and report, per document, its token count,
    out-of-vocabulary occurrence count and OOV rate. This is the
    coverage curve a tokenizer/vocab decision reads: how much of each
    document (and via aggregation, the corpus) a V-entry vocabulary
    explains.

    Plan shape, built for 100 TB: one token explode; ONE
    groupBy(token) count with map-side partials; the top-V selection
    is a bounded TakeOrdered (V rows survive); the vocabulary is then
    BROADCAST (bounded by construction — that is the point of a
    vocabulary) and each occurrence left-joins it map-side; one
    per-doc aggregate. Docs with zero tokens have no occurrences and
    are absent (the length gates in quality_profile own that class).
    At extreme scale the exact count feeding top-V is the expensive
    stage; the count-min path (functions/sketches.py) bounds it when
    approximate vocabulary selection is acceptable."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    tk = documents.select(F.col(id_col),
                          F.explode(textfn.tokens(F.col(text_col)))
                          .alias("w"))
    vocab = (tk.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
             .orderBy(F.desc("c"), F.asc("w")).limit(vocab_size)
             .select("w", F.lit(True).alias("__in")))
    return (tk.join(F.broadcast(vocab), "w", "left")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum(F.when(F.col("__in").isNull(), F.lit(1))
                       .otherwise(F.lit(0))).alias("n_oov"))
            .select(id_col, "n_tokens", "n_oov",
                    F.round(F.col("n_oov")
                            / F.col("n_tokens").cast("double"), 6)
                    .alias("oov_rate")))


def collocation_lift(documents: DataFrame, min_count: int = 5,
                     k: int = 50, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Corpus-level collocation mining by LIFT (extension E69):
    rank bigrams by ``P(w1,w2) / (P(w1)·P(w2))`` — the exponentiated
    PMI, which keeps the association ordering while avoiding ``log``
    (transcendental last-ulp behavior differs between engines; every
    input here is an exact BIGINT count and the lift is two correctly
    rounded IEEE multiplies and one divide, so a SQL oracle replays
    the exact doubles). ``min_count`` is the standard support floor —
    without it hapax pairs of hapax words trivially top the list.

    Output: top-``k`` bigrams by (lift DESC, w1, w2), with the exact
    pair / unigram occurrence counts kept for auditability.

    Plan shape at 100 TB: one token explode (corpus-token-linear), one
    bigram groupBy and one unigram groupBy — both with map-side
    partials, so stop-word hot keys ship one partial row per map task
    — then two re-joins of the (already min_count-filtered, hence
    vocab²-bounded-but-small) bigram table to the unigram counts on
    the word keys, and a TakeOrderedAndProject for the top-k. No
    window, no driver state, nothing quadratic.
    """
    tk = (documents
          .select(F.col(id_col),
                  F.transform(textfn.tokens(F.col(text_col)),
                              F.lower).alias("tk")))
    uni = (tk.select(F.explode("tk").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("u")))
    n = F.size("tk")
    bg = (tk.filter(F.size("tk") >= 2)
          .select(F.explode(F.arrays_zip(F.slice("tk", 1, n - 1),
                                         F.slice("tk", 2, n - 1)))
                  .alias("b"))
          .select(F.col("b")["0"].alias("w1"),
                  F.col("b")["1"].alias("w2")))
    pairs = (bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
             .filter(F.col("pair_count") >= min_count))
    total = uni.agg(F.sum("u").alias("n_tokens"))
    scored = (pairs
              .join(uni.select(F.col("w").alias("w1"),
                               F.col("u").alias("w1_count")), "w1")
              .join(uni.select(F.col("w").alias("w2"),
                               F.col("u").alias("w2_count")), "w2")
              .crossJoin(F.broadcast(total))
              .withColumn(
                  "lift",
                  F.round((F.col("pair_count").cast("double")
                           * F.col("n_tokens").cast("double"))
                          / (F.col("w1_count").cast("double")
                             * F.col("w2_count").cast("double")), 6)))
    return (scored.select("w1", "w2", "pair_count", "w1_count",
                          "w2_count", "lift")
            .orderBy(F.col("lift").desc(), "w1", "w2").limit(k))


def robust_outlier_profile(df: DataFrame, group_col: str,
                           value_col: str, k_mad: float = 3.0) -> DataFrame:
    """Per-group robust outlier profile (extension E71): median and
    MAD (median absolute deviation) of ``value_col`` within each
    ``group_col`` value, plus the count of rows whose deviation
    exceeds ``k_mad``·MAD — the robust z-score screen a curation
    pipeline runs per source to catch length/score distributions
    poisoned by boilerplate or truncation, where mean/stddev would be
    dragged by the very outliers being hunted.

    Exactness: the exact interpolated percentile over doubles that are
    exact integer casts; the midpoint interpolation and the
    ``|x − med| > k·MAD`` comparison are single IEEE ops, identical in
    any engine (the events_exact_median discipline, per group).

    Scale: exact percentile buffers each group's values — the right
    correctness gate, and fine while groups are sources (few, giant —
    they split across partial buffers). At extreme per-group volume
    production swaps in ``approx_percentile`` (sketch-mergeable,
    bounded memory) and re-validates against this exact form on a
    sample, the approx_aggregates pattern. The outlier count itself is
    one re-join on the group key + a groupBy with map-side partials.
    """
    v = F.col(value_col).cast("double")
    med = (df.groupBy(group_col)
           .agg(F.expr(f"percentile(CAST({value_col} AS DOUBLE), 0.5)")
                .alias("med")))
    dev = (df.join(med, group_col)
           .withColumn("__ad", F.abs(v - F.col("med"))))
    mad = (dev.groupBy(group_col)
           .agg(F.expr("percentile(__ad, 0.5)").alias("mad")))
    return (dev.join(mad, group_col)
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.max("med").alias("med_value"),
                 F.max("mad").alias("mad_value"),
                 F.sum(F.when(F.col("__ad")
                              > F.lit(float(k_mad)) * F.col("mad"),
                              F.lit(1)).otherwise(F.lit(0)))
                 .cast("bigint").alias("n_outliers")))
