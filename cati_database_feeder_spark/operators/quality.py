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
