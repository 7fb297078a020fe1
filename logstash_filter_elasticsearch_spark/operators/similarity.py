"""Similarity search over embedding columns (array<float>).

Two tiers:

* ``cosine_topk`` — exact brute force: broadcast the (small) query set,
  one pass over the corpus, per-query top-k via window. The dot product
  is ``F.zip_with`` + ``F.aggregate`` — pure JVM expressions, no UDF.
  This is the baseline/oracle path.
* ``lsh_topk`` — random-hyperplane LSH: a deterministic (seeded) plane
  matrix signs each vector into a bucket signature; candidates join on
  (probe) bucket equality and are re-ranked exactly. The scale path:
  the corpus is scanned once to compute signatures (cacheable /
  precomputable as a column), and each query touches only its bucket.

At 100 TB the LSH signature would be a persisted column partitioned by
bucket prefix so a query prunes partitions; the plan here keeps that
shape (signature column -> equi-join) so the swap is a storage change,
not a plan change.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    queries must be small (it is broadcast). Output:
    (query_id, neighbor_id, cos) — self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = scored.withColumn(
        "cos", cosine(F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("_rn").alias("rank"))
    )


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def hyperplane_signature(
    vec_col: Column, dim: int, n_planes: int = 16, seed: int = 42
) -> Column:
    """Sign-of-dot-product bucket signature (random projection LSH)."""
    planes = _planes(dim, n_planes, seed)
    bits = F.lit(0).cast("long")
    v = vec_col.cast("array<double>")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        bits = bits + F.when(dot(v, p) >= 0, F.lit(bit_val).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bits


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-table hyperplane LSH + exact re-rank.

    n_tables independent signatures; a candidate matches a query if any
    table's bucket agrees. Recall rises with n_tables, cost with bucket
    size. Candidates are then scored exactly like cosine_topk.
    """
    sig_structs = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                hyperplane_signature(
                    F.col(vec_col), dim, n_planes, seed + 1000 * t
                ).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    c_sig = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), sig_structs.alias("_s")
    ).select("neighbor_id", "_cv", F.explode("_s").alias("_t")).select(
        "neighbor_id", "_cv", "_t.table", "_t.bucket"
    )
    q_sig = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), sig_structs.alias("_s")
    ).select("query_id", "_qv", F.explode("_s").alias("_t")).select(
        "query_id", "_qv", "_t.table", "_t.bucket"
    )

    cands = (
        c_sig.join(F.broadcast(q_sig), ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "_qv", "neighbor_id", "_cv")
        .distinct()
    )
    scored = cands.withColumn(
        "cos", cosine(F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("_rn").alias("rank"))
    )
