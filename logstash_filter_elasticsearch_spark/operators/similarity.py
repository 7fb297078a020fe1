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


def _unit(a: Column) -> Column:
    n = norm(a)
    return F.transform(a, lambda x: x / n)


def train_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_rows: int = 2048,
    iters: int = 5,
    seed: int = 42,
) -> list[list[float]]:
    """Driver-side k-means (spherical) on a DETERMINISTIC sample.

    The sample is the first ``sample_rows`` by id order — stable across
    runs and partitionings (no RNG in the scan). Lloyd iterations run in
    numpy on the driver; at 100 TB you train once and persist the
    centroid table next to the index, exactly like a FAISS IVF coarse
    quantizer.
    """
    rows = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(sample_rows)
        .collect()
    )
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for j in range(len(cent)):
            members = x[assign == j]
            if len(members):
                c = members.mean(axis=0)
                cent[j] = c / max(np.linalg.norm(c), 1e-12)
    return cent.tolist()


def _nearest_centroids(vec_col: Column, centroids: list[list[float]], n: int) -> Column:
    """Array of the n centroid ids with highest cosine to the vector —
    pure Column expressions (sort an array of (score, id) structs)."""
    v = _unit(vec_col.cast("array<double>"))
    scored = F.array(
        *[
            F.struct(
                dot(v, F.array(*[F.lit(x) for x in c])).alias("s"),
                F.lit(i).alias("c"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    ranked = F.reverse(F.array_sort(scored))
    return F.transform(F.slice(ranked, 1, n), lambda e: e["c"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: list[list[float]] | None = None,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize the corpus
    to its nearest centroid, probe the query's ``n_probe`` nearest
    cells, re-rank candidates exactly.

    The scale path for ANN beyond LSH: the corpus assignment is a
    persistable column (partition the index table by ``_cell`` so a
    query prunes to n_probe/n_centroids of the data). Everything is
    Column expressions — no Python on the scan.
    """
    if centroids is None:
        centroids = train_centroids(
            corpus, id_col, vec_col, n_centroids=n_centroids, seed=seed
        )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _nearest_centroids(F.col(vec_col), centroids, 1)[0].alias("_cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(_nearest_centroids(F.col(vec_col), centroids, n_probe)).alias("_cell"),
    )
    cands = c.join(F.broadcast(q), "_cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cands.withColumn(
        "cos", cosine(F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>"))
    ).select("query_id", "neighbor_id", "cos").distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("_rn").alias("rank"))
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Exact embedding near-duplicate pairs: all (a < b) with
    cosine >= threshold. O(n^2) — the baseline/oracle path; use
    ``lsh_near_dup_pairs`` at scale."""
    a = df.select(F.col(id_col).alias("id_a"), _unit(F.col(vec_col).cast("array<double>")).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), _unit(F.col(vec_col).cast("array<double>")).alias("_vb"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos", dot(F.col("_va"), F.col("_vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def lsh_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-dup pairs: candidates share a hyperplane bucket
    in ANY of n_tables tables (self-join on (table, bucket) — never a
    cross join), then exact cosine filter. The 100 TB shape: bucket ids
    are a persisted column, the self-join shuffles only bucket-sized
    groups."""
    sig = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                hyperplane_signature(F.col(vec_col), dim, n_planes, seed + 1000 * t).alias(
                    "bucket"
                ),
            )
            for t in range(n_tables)
        ]
    )
    s = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), sig.alias("_s"))
        .select("id", "v", F.explode("_s").alias("_t"))
        .select("id", "v", "_t.table", "_t.bucket")
    )
    left = s.select(F.col("id").alias("id_a"), F.col("v").alias("_va"), "table", "bucket")
    right = s.select(F.col("id").alias("id_b"), F.col("v").alias("_vb"), "table", "bucket")
    cands = (
        left.join(right, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_va", "_vb")
        .distinct()
    )
    return (
        cands.withColumn(
            "cos",
            cosine(F.col("_va").cast("array<double>"), F.col("_vb").cast("array<double>")),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


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
