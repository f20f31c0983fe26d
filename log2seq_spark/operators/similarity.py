"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an IVF-style variant
(assign to nearest centroid, search only the probed cells) as the scale
path. All dot products are built-in higher-order functions
(``zip_with`` + ``aggregate``) — JVM-side, no Python.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(a):
    # widen BEFORE multiplying: float*float then widening loses bits and
    # diverges from engines (e.g. DuckDB oracle) that cast elements first
    return F.transform(a, lambda x: x.cast("double"))


def dot_expr(a, b):
    return F.aggregate(F.zip_with(_as_double(a), _as_double(b),
                                  lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a):
    return F.sqrt(F.aggregate(F.transform(_as_double(a), lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_expr(a, b):
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _vec_lit(vec: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(embs: DataFrame, query_vec: Sequence[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force top-k by cosine. One narrow scan + a k-row
    ordered limit (Spark runs it as TakeOrdered — no full sort shuffle)."""
    q = _vec_lit(query_vec)
    return (embs.select(F.col(id_col),
                        cosine_expr(F.col(vec_col), q).alias("cosine"))
                .orderBy(F.desc("cosine"), F.asc(id_col))
                .limit(k))


def assign_centroid(embs: DataFrame, centroids: List[Sequence[float]],
                    vec_col: str = "embedding") -> DataFrame:
    """IVF cell assignment: argmax cosine over a broadcast centroid list
    (a literal array-of-arrays — evaluated JVM-side per row)."""
    scored = F.array(*[
        F.struct(cosine_expr(F.col(vec_col), _vec_lit(c)).alias("s"),
                 F.lit(i).alias("c"))
        for i, c in enumerate(centroids)])
    best = F.array_max(scored)
    return embs.withColumn("centroid", best["c"])


def ivf_topk(embs: DataFrame, centroids: List[Sequence[float]],
             query_vec: Sequence[float], k: int = 10, n_probe: int = 1,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: score only the ``n_probe`` cells nearest to the
    query. At scale, write the table bucketed/partitioned by ``centroid``
    so the probe prunes partitions at scan time."""
    import math
    q = list(query_vec)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return d / (na * nb) if na and nb else 0.0

    order = sorted(range(len(centroids)), key=lambda i: -cos(centroids[i], q))
    probe = order[:n_probe]
    assigned = assign_centroid(embs, centroids, vec_col)
    return (assigned.filter(F.col("centroid").isin(probe))
                    .select(F.col(id_col),
                            cosine_expr(F.col(vec_col), _vec_lit(q)).alias("cosine"))
                    .orderBy(F.desc("cosine"), F.asc(id_col))
                    .limit(k))
