"""Vector/embedding column expressions (extension op E7, SURVEY.md §2.10).

Dot product / norm / cosine over ``array<float>`` embedding columns as
built-in higher-order functions (``zip_with`` + ``aggregate``) — these
run JVM-side per row with no Python and no shuffle. Elements are cast
to double *before* accumulation and folded left-to-right, which makes
the result bit-deterministic and equal to the DuckDB oracle's
sequential ``list_dot_product`` on a DOUBLE[] cast.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double precision, sequential fold."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    """Euclidean norm ‖a‖₂."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either side has zero norm."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def cosine_from_norms(a: Column, b: Column,
                      norm_a: Column, norm_b: Column) -> Column:
    """Cosine with pre-computed norms. In any pairwise plan, compute
    ‖v‖ once per VECTOR as a column and pass it here — the inline
    ``cosine`` recomputes both norms per PAIR (3 array folds instead
    of 1). Same arithmetic, bit-identical result."""
    return dot(a, b) / F.nullif(norm_a * norm_b, F.lit(0.0))


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance between two vectors."""
    diffs = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x * x))


def simhash_sign(a: Column) -> Column:
    """Sign pattern of a vector as a bit string — the random-hyperplane
    LSH signature used to bucket embeddings before exact rerank."""
    bits = F.transform(a, lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.array_join(bits, "")
