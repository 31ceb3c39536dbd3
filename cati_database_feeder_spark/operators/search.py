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


def hybrid_rrf_topk(documents: DataFrame, embeddings: DataFrame,
                    terms: list[str], query_vec_id: int, k: int = 20,
                    k_each: int = 50, rrf_k: int = 60,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Hybrid retrieval (extension E51): fuse a LEXICAL ranking (BM25
    over ``documents``) with a SEMANTIC ranking (exact cosine over
    ``embeddings`` against the stored vector of ``query_vec_id``) by
    reciprocal-rank fusion::

        rrf(d) = sum over rankers r of 1 / (rrf_k + rank_r(d))

    — the standard Cormack/Clarke/Buettcher fusion that needs no score
    normalization because it consumes only the ranks, which is exactly
    what makes it oracle-able bit-for-bit: both rank lists are
    deterministic integers (BM25 ranks on the 4-decimal-rounded score
    with a doc_id tie-break; cosine ranks on raw bit-identical doubles
    with a vec_id tie-break), so the fused score is a sum of TWO exact
    dyadic-free divisions evaluated in a fixed order — no float-sum
    ordering hazard.

    Scale shape: each ranker is the already-audited corpus-linear plan
    (bm25_topk: bounded explode + tiny broadcast stats + heap top-k;
    brute_force_topk: one pass, per-vector norms). The fusion itself
    touches only 2·k_each rows — the windows below rank frames ALREADY
    limited to k_each, so the single-partition window is bounded by
    construction, never corpus-sized. A missing ranker contributes 0
    (full outer join), the classic RRF convention.

    Requires the corpus convention doc_id == vec_id (the driver's
    documents/embeddings tables are aligned 1:1)."""
    from pyspark.sql import Window

    lex = (bm25_topk(documents, terms, k=k_each, id_col=id_col,
                     text_col=text_col)
           .withColumn("lex_rank", F.row_number().over(
               Window.orderBy(F.desc("score"), F.asc(id_col))))
           .select(F.col(id_col).alias("id"), "lex_rank"))

    from cati_database_feeder_spark.operators.similarity import brute_force_topk
    q = (embeddings.filter(F.col("vec_id") == query_vec_id)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_vec")))
    sem = (brute_force_topk(q, embeddings, k=k_each,
                            broadcast_queries=True)
           .select(F.col("vec_id").alias("id"),
                   F.col("rank").alias("sem_rank")))

    fused = (lex.join(sem, "id", "full_outer")
             .select("id", "lex_rank", "sem_rank",
                     (F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rank")),
                                 F.lit(0.0))
                      + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("sem_rank")),
                                   F.lit(0.0))).alias("rrf_raw")))
    return (fused
            .orderBy(F.desc("rrf_raw"), F.asc("id"))
            .limit(k)
            .select(F.col("id").alias(id_col), "lex_rank", "sem_rank",
                    F.round("rrf_raw", 6).alias("rrf")))
