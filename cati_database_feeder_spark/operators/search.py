"""BM25 full-text ranking over the documents table (extension E8).

The retrieval shape a training-data pipeline runs for corpus curation
(query-relevance filtering, near-query sampling): score every document
against a small fixed term set with BM25 and keep the top-k.

Plan shape, built for 100 TB:
- tokenize + explode ONLY the matching terms (the explode is filtered
  by an ``array_contains`` pre-check, so the per-row blowup is bounded
  by the query length, not the document length);
- per-term document frequencies and the corpus size / average length
  are tiny aggregates (rows = |terms| and 1), broadcast back — no
  corpus-sized shuffle anywhere;
- the final top-k is ORDER BY + LIMIT → TakeOrderedAndProject (per-
  partition heap + driver merge, never a global sort).

Scores are rounded to 4 decimals with a doc_id tie-break so Spark and
any other engine (libm log/division may differ in the last ulp) agree
on the exact top-k set and order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cati_database_feeder_spark.functions import text as textfn


def bm25_topk(documents: DataFrame, terms: list[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-k documents by BM25 score for ``terms`` (lowercased match).

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) — the Robertson/Sparck
    Jones form with the +1 that keeps it positive for df > N/2.
    """
    terms_arr = F.array(*[F.lit(t) for t in terms])
    toks = (documents
            .select(F.col(id_col), F.transform(textfn.tokens(F.col(text_col)), F.lower).alias("tk"))
            .select(F.col(id_col), "tk", F.size("tk").alias("dl"))
            # pre-filter: docs with no query term never explode
            .filter(F.size(F.array_intersect(F.array_distinct("tk"), terms_arr)) > 0))

    # per-(doc, term) term frequency — explode only matching terms
    tf = (toks.select(
            id_col, "dl",
            F.explode(F.filter("tk", lambda t: F.array_contains(terms_arr, t))).alias("term"))
          .groupBy(id_col, "term", "dl").agg(F.count(F.lit(1)).alias("tf")))

    # corpus stats: N and avg length over ALL docs (not just matches) —
    # one narrow scan of the text column; at 100 TB a production
    # deployment materializes per-doc token length once as table
    # metadata instead of re-deriving it here
    stats = (documents.select(textfn.token_count(F.col(text_col)).alias("dl"))
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.avg("dl").alias("avg_dl")))

    # df as a window count over tf — tf is |matching docs × terms| rows
    # (tiny), and the window avoids a second traversal of the corpus
    # subplan that a groupBy+self-join on tf would duplicate
    from pyspark.sql import Window
    tf = tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))

    scored = (tf
              .crossJoin(F.broadcast(stats))
              .withColumn("idf", F.log(
                  F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                  / (F.col("df") + F.lit(0.5))))
              .withColumn("score_t", F.col("idf") * F.col("tf") * (F.lit(k1) + 1.0)
                          / (F.col("tf") + F.lit(k1) * (F.lit(1.0) - F.lit(b)
                             + F.lit(b) * F.col("dl") / F.col("avg_dl"))))
              .groupBy(id_col)
              .agg(F.round(F.sum("score_t"), 4).alias("score")))

    return (scored
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k))
