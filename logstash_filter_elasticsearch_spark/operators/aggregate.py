"""Per-sink aggregates with skew-killing salted two-phase execution.

The reference copies named server-side aggregation results into events
(``aggregation_fields``, dsl_executor.rb:71-77). Set-oriented, the
per-sink aggregate IS that operator: one row per route with
count / sum(n_tok) / matched counts.

Why salting: the route key is heavily skewed (one source holds ~60% of
rows — FIXTURES.md F1; at 10^12 rows that single reducer would own
600G rows). ``salted_agg`` does groupBy(keys ⊕ salt) partial
aggregation first, then recombines per key — two small shuffles, no
hot reducer. For algebraic aggregates (count/sum/min/max) the result
is bit-identical to the unsalted plan, which tests assert. Spark's
map-side partial aggregation already mitigates this for low-cardinality
keys; the explicit salt is the general-case guarantee (e.g. when the
first groupBy key set is high-cardinality with hot keys, like the
doc_id dedup in the LRU-dedup emulation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# partial-fn, combine-fn pairs for algebraic aggregates
_ALGEBRAIC = {
    "count": ("count", "sum"),
    "sum": ("sum", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | Column]],
    salt_buckets: int = 32,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) then groupBy(keys).

    ``aggs``: dest column -> (fn, src). fn in {count,sum,min,max}.
    ``salt_on``: expression whose hash spreads each hot key (defaults
    to spark_partition_id so the partial agg is map-local).
    """
    for dest, (fn, _) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{dest}: {fn} is not algebraic; cannot salt")

    if salt_on is None:
        salt = F.spark_partition_id() % salt_buckets
    else:
        col = F.col(salt_on) if isinstance(salt_on, str) else salt_on
        salt = F.pmod(F.hash(col), F.lit(salt_buckets))

    partial_exprs = []
    for dest, (fn, src) in aggs.items():
        src_col = F.col(src) if isinstance(src, str) else src
        partial_fn = getattr(F, _ALGEBRAIC[fn][0])
        partial_exprs.append(partial_fn(src_col).alias(f"_p_{dest}"))

    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_exprs)

    final_exprs = []
    for dest, (fn, _) in aggs.items():
        combine_fn = getattr(F, _ALGEBRAIC[fn][1])
        final_exprs.append(combine_fn(F.col(f"_p_{dest}")).alias(dest))
    return phase1.groupBy(*keys).agg(*final_exprs)


def salted_dedup_first(
    df: DataFrame,
    key: str,
    order_by: list[Column],
    salt_buckets: int = 32,
) -> DataFrame:
    """Keep the first row per key under a total order — LRU-style dedup.

    Emulates "latest wins" cache semantics over a skewed key via the
    same two-phase trick: min_by within (key, salt), then min_by across
    salts. Deterministic given a total order.
    """
    ordering = F.struct(*order_by)
    # salt by INPUT PARTITION, never by a hash of the group key: hashing
    # the key gives every row of a hot key the same salt (zero spread).
    # partition-id salt makes phase 1 a per-partition combiner — the
    # hot key contributes at most one row per (input partition, key).
    packed = df.withColumn("_ord", ordering).withColumn(
        "_salt", F.spark_partition_id() % salt_buckets
    )
    row = F.struct(*[F.col(c) for c in df.columns])
    phase1 = packed.groupBy(key, "_salt").agg(F.min_by(row, F.col("_ord")).alias("_row"),
                                              F.min("_ord").alias("_ord"))
    phase2 = phase1.groupBy(key).agg(F.min_by("_row", "_ord").alias("_row"))
    return phase2.select("_row.*")
