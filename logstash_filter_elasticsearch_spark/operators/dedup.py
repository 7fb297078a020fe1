"""Deduplication operators for training-data pipelines.

Beyond the reference's scope (it enriches; it never dedups), but the
LRU-style dedup required by the graft north star (BASELINE.json:6) and
standard web-scale corpus hygiene both land here. Every operator is a
pure DataFrame program designed for the 100 TB shape:

* exact/normalized dedup: group on a 128-bit content hash, never on the
  raw text — the shuffle moves 16-byte keys, not documents.
* MinHash + LSH: shingle -> per-permutation xxhash64 min -> band
  buckets -> candidate join -> exact-Jaccard verify. The candidate join
  is on (band_idx, band_hash) so only near-duplicates ever meet; the
  full O(N^2) pair space is never materialized.
* SimHash: 64-bit sign-sum fingerprint computed in one exploded
  aggregate; near-dup candidates via 16-bit chunk blocking (Hamming
  distance <= 3 guarantees a matching chunk by pigeonhole).
* n-gram Jaccard: exact verify used standalone for small/medium sets.

All hashing is seeded/deterministic (xxhash64 with fixed literal seeds)
so results are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """lowercase, strip punctuation, collapse whitespace."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^\p{L}\p{N}\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str, normalized: bool = False
) -> DataFrame:
    """Keep the min-id row per distinct content; count duplicates.

    Groups on md5(content), not content: at 10^12 rows the shuffle key
    is 16 bytes/row regardless of document size.
    """
    content = normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    # no _spread here: the aggregation shuffles only 16-byte hashes and
    # the single md5 pass is cheaper than shuffling the raw rows
    # (measured 0.35s vs 0.65s at sf1.0)
    return (
        df.withColumn("_h", F.md5(content))
        .groupBy("_h")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("_h")
    )


def word_shingles(text_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (one regex pass).

    Same expression as ``with_word_shingles`` for use in ad-hoc selects.
    """
    norm = F.trim(F.regexp_replace(text_col, r"\s+", " "))
    gram = r"(?=((?:\S+ ){%d}\S+))\S+" % (n - 1)
    grams = F.regexp_extract_all(norm, F.lit(gram), 1)
    return F.array_distinct(
        F.when(F.size(grams) > 0, grams).otherwise(F.array(norm))
    )


def with_word_shingles(
    df: DataFrame, text_col: str, n: int = 3, out: str = "_sh"
) -> DataFrame:
    """Shingles via ONE native regex pass (stays in codegen).

    Overlapping word n-grams extracted with a lookahead capture —
    ``(?=((?:\\S+ ){n-1}\\S+))\\S+`` over whitespace-normalized text
    yields group 1 at every word start with >= n words remaining.
    Higher-order ``transform``+``slice``+``array_join`` runs
    interpreted per element and measured ~10x slower (2.8s -> 0.3s for
    5000 docs); semantics are identical: distinct, space-joined, and a
    document shorter than n words contributes its whole text as the
    single shingle.
    """
    return df.withColumn(out, word_shingles(F.col(text_col), n))


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a too-coarse scan before expensive per-row work.

    Guide §2.5 "input skew": a single-file (single-row-group) parquet
    table scans as ONE task, so shingle extraction / hashing would run
    on one core regardless of cluster size. Spreading the cheap raw
    rows round-robin to the session's shuffle parallelism costs one
    tiny shuffle of the text column and parallelizes everything
    downstream. No-op when the input already has enough partitions
    (e.g. the 64-file bench pipeline dataset), so well-laid-out tables
    never pay an extra shuffle. Deterministic under retries (Spark
    sorts before round-robin repartition, SPARK-23207).
    """
    if df.isStreaming:  # partition introspection needs a batch plan
        return df
    spark = df.sparkSession
    try:
        target = int(spark.conf.get("spark.sql.shuffle.partitions"))
        nparts = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if nparts * 4 <= target else df


def _drop_heavy_keys(rows: DataFrame, key_cols: list[str], cap: int) -> DataFrame:
    """Remove rows whose key appears in more than ``cap`` rows.

    Heavy-hitter guard for posting-list aggregations: a stop-shingle /
    degenerate bucket with document frequency f would build ONE
    f-element collect_list row (OOM at web scale) and f^2/2 pairs.
    Detection is a cheap map-side-combined count; the heavy-key set is
    tiny by construction (keys with > cap occurrences), so the removal
    is a broadcast left_anti join — no extra shuffle of ``rows``.
    A post-aggregation size filter would NOT help: the huge row gets
    built before the filter sees it.
    """
    heavy = (
        rows.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > cap)
        .select(*key_cols)
    )
    return rows.join(F.broadcast(heavy), key_cols, "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    df_cap: int | None = 10_000,
) -> DataFrame:
    """Exact Jaccard similarity over word n-gram shingle sets.

    Pair generation via an equi-join on shared shingles — i.e. only
    pairs with non-zero intersection exist, and Catalyst shuffles on
    the shingle hash. |A|,|B| ride along so Jaccard needs no second
    join. Output: (id_a, id_b, jaccard) with id_a < id_b.

    ``df_cap``: stop-shingle cutoff — shingles occurring in more than
    df_cap documents are excluded from pair generation (standard
    near-dup practice: such shingles carry no similarity signal but
    cost f^2/2 pairs and an f-element aggregation row). Set sizes are
    recomputed AFTER the cutoff, so a dropped shingle leaves both the
    intersection and the union: Jaccard stays exact over the reduced
    shingle universe rather than being systematically underestimated
    for documents containing stop-shingles. None disables the guard
    (exact semantics over the full universe).
    """
    # One evaluation of the shingle expression, total:
    # * pair generation groups by shingle hash and double-explodes the
    #   per-shingle posting list instead of a self-join (a self-join
    #   re-evaluates the whole shingle subtree per side; measured 1.5x
    #   end-to-end). Posting lists are bounded by document frequency;
    #   a stop-shingle appearing in f docs costs f^2/2 pairs either way.
    # * 64-bit shingle hash instead of the string as shuffle key
    #   (collision odds ~1e-9 at 1e5 distinct shingles).
    base = with_word_shingles(
        _spread(df.select(F.col(id_col).alias("_id"), text_col)), text_col, n
    )
    if df_cap is not None:
        # the exploded (id, hash) rows feed three consumers (heavy-key
        # count, post-filter sizes, postings); persist them so the
        # regex extraction + explode runs once, not once per consumer
        # (the r5 plan scanned+extracted the corpus 6x). Released by
        # Spark's ContextCleaner when the caller drops the result.
        from pyspark import StorageLevel

        sh0 = base.select("_id", F.explode("_sh").alias("_shs")).select(
            "_id", F.xxhash64("_shs").alias("_sh")
        )
        sh0 = sh0.persist(StorageLevel.MEMORY_AND_DISK)
        sh = _drop_heavy_keys(sh0, ["_sh"], df_cap)
        # post-filter set size as a per-doc aggregate (NOT a window:
        # count-over-window shuffles every exploded row uncombined;
        # groupBy map-side-combines down to one row per doc), attached
        # back onto the exploded rows so the posting lists carry
        # (id, sz) and the pair stream never needs a size join later
        # (the r5 plan joined sizes onto an ~1e8-row pair table). AQE
        # broadcasts `sizes` when it is small; at web scale it is a
        # plain equi-join on the id.
        sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
        sh = sh.join(sizes, "_id")
    else:
        # guard off: size rides along from F.size() — no extra shuffle
        sh = (
            base.withColumn("_sz", F.size("_sh"))
            .select("_id", "_sz", F.explode("_sh").alias("_shs"))
            .select("_id", "_sz", F.xxhash64("_shs").alias("_sh"))
        )
    posting = sh.groupBy("_sh").agg(
        F.array_sort(F.collect_list(F.struct("_id", "_sz"))).alias("_ds")
    ).filter(F.size("_ds") > 1)
    # Emit each unordered pair ONCE: posexplode the id-sorted posting
    # list and inner-explode only the strict suffix. Generates exactly
    # f(f-1)/2 rows per posting instead of the f^2 rows a double
    # explode + id_a < id_b filter creates (measured ~10% off the
    # whole query at sf1.0).
    pairs = (
        posting.select(F.posexplode("_ds").alias("_i", "_a"), "_ds")
        .select(
            "_a",
            F.explode(
                F.slice("_ds", F.col("_i") + 2, F.size("_ds"))
            ).alias("_b"),
        )
        # size-ratio prune BEFORE the shuffle: jaccard <= min/max (the
        # overlap is at most the smaller set), and both sides of the
        # comparison are the same IEEE double division the final
        # jaccard uses, so no qualifying pair can be dropped (division
        # is monotone). At threshold 0.5 this cuts ~25% of pair rows.
        .filter(
            F.least(F.col("_a._sz"), F.col("_b._sz"))
            / F.greatest(F.col("_a._sz"), F.col("_b._sz"))
            >= F.lit(float(threshold))
        )
        .select(
            F.col("_a._id").alias("id_a"),
            F.col("_b._id").alias("id_b"),
            F.col("_a._sz").alias("sz_a"),
            F.col("_b._sz").alias("sz_b"),
        )
    )
    # Counting stays a JVM hash aggregate: the pair stream is the
    # structural cost (sum over shingles of f(f-1)/2 rows — 97M at
    # sf1.0) and a vectorized-Python counter was measured STRICTLY
    # worse (the JVM->Python Arrow boundary alone costs ~290ns/row =
    # 28s for this stream, vs a few seconds for the codegen hash
    # aggregate). Carrying sz in the grouping key means no size join
    # ever touches the ~86M-row distinct-pair table (the r5 plan
    # joined sizes onto it twice).
    #
    # The explicit high-count repartition keeps the aggregation maps
    # small: with the session's default reducer count the ~86M distinct
    # pairs meant ~2M-entry hash maps per task, which overflowed
    # execution memory and spilled ~11 GB per aggregate stage (guide
    # §5). 4x the session's shuffle parallelism puts the per-task map
    # in the hundreds of thousands of entries — spill-free — and an
    # explicit numPartitions is exempt from AQE coalescing (which
    # would re-merge to 64 MB targets and reintroduce the spill).
    # Scale-adaptive: derived from the session conf, not a constant.
    n_agg = 4 * int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    common = pairs.repartition(n_agg, "id_a", "id_b").groupBy(
        "id_a", "id_b", "sz_a", "sz_b"
    ).agg(F.count(F.lit(1)).alias("_common"))
    jac = F.col("_common") / (F.col("sz_a") + F.col("sz_b") - F.col("_common"))
    return (
        common.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_perm: int = 64, shingle_n: int = 3
) -> DataFrame:
    """MinHash signature per document: num_perm seeded xxhash64 minima.

    Shape chosen for scale: explode shingles once, then ONE grouped
    aggregate with num_perm min(xxhash64(shingle, seed_i)) columns —
    every hash/min runs inside whole-stage codegen with map-side
    partial aggregation, and the shuffle carries only (id, num_perm
    longs). (A transform+array_min formulation keeps everything in one
    row but runs interpreted — higher-order functions don't codegen —
    and was ~100x slower on long documents.)
    """
    sh = with_word_shingles(
        _spread(df.select(F.col(id_col).alias("_id"), text_col)), text_col, shingle_n
    ).select("_id", F.explode("_sh").alias("_s"))
    mins = [
        F.min(F.xxhash64("_s", F.lit(i))).alias(f"_m{i}") for i in range(num_perm)
    ]
    agg = sh.groupBy("_id").agg(*mins)
    sig = F.array(*[F.col(f"_m{i}") for i in range(num_perm)])
    return agg.select("_id", sig.alias("_sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    shingle_n: int = 3,
    bucket_cap: int | None = 10_000,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verify.

    rows-per-band r = num_perm/bands; candidate prob ≈ 1-(1-s^r)^bands.
    Candidates meet only inside (band, band_hash) buckets — the join
    key is a 64-bit hash, so skew is bounded by true duplicate clusters
    (AQE skew-join splits those).

    ``bucket_cap`` is the OOM backstop: a band bucket with more than
    bucket_cap members (a mega-cluster of exact copies, or a
    degenerate band) is excluded from candidate generation before its
    posting list is built. A cluster of f copies legitimately has
    f^2/2 pairs — at web scale you run exact_dedup first so f stays
    small; the cap bounds the damage when that invariant breaks.
    """
    assert num_perm % bands == 0
    r = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_n)

    band_rows = sigs.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("_sig")[b * r + j] for j in range(r)]
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band"),
    ).select("_id", "_band.band", "_band.bhash")

    # group-then-pair instead of a self-join: the signature subtree
    # (shingles + num_perm hash-min aggregate) is evaluated once, not
    # once per join side
    if bucket_cap is not None:
        # the guard consumes band_rows twice (heavy-key count + anti-
        # join); persist the compact (id, band, bhash) rows so the
        # signature aggregate isn't recomputed — production LSH builds
        # materialize the signature table as an index artifact anyway.
        # Lifecycle: the returned plan references this cache, and
        # Spark's ContextCleaner unpersists it once the caller drops
        # the result DataFrame — it is not pinned for the session.
        from pyspark import StorageLevel

        band_rows = band_rows.persist(StorageLevel.MEMORY_AND_DISK)
        band_rows = _drop_heavy_keys(band_rows, ["band", "bhash"], bucket_cap)
    posting = band_rows.groupBy("band", "bhash").agg(
        F.collect_list("_id").alias("_ids")
    ).filter(F.size("_ids") > 1)
    candidates = (
        posting.select(F.explode("_ids").alias("id_a"), "_ids")
        .select("id_a", F.explode("_ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )

    # exact verify on the candidate set only; persisted because BOTH
    # candidate join sides read it — otherwise the shingle extraction
    # runs once per side (released by the ContextCleaner with the
    # result)
    docs = with_word_shingles(
        _spread(df.select(F.col(id_col).alias("_id"), text_col)), text_col, shingle_n
    ).select("_id", "_sh")
    from pyspark import StorageLevel

    docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    verified = (
        candidates.join(docs.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sh_a")), "id_a")
        .join(docs.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sh_a", "_sh_b"))
            / F.size(F.array_union("_sh_a", "_sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash(
    df: DataFrame, id_col: str, text_col: str, hash_mode: str = "xxhash"
) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    Explode words once; per bit, sum +1/-1 by that bit of the word
    hash; sign -> fingerprint bit. 64 conditional sums in ONE grouped
    aggregate — a single shuffle keyed by doc id.

    hash_mode selects the per-word 64-bit hash:
    * "xxhash" (prod default): seeded xxhash64 — fastest, JVM-native.
    * "md5": the first 16 hex chars of md5(word) read as 4 little-
      endian 16-bit chunks (bit i := chunk[i//16] >> (i%16) & 1).
      Same bit quality, but computable bit-for-bit in DuckDB too, so
      the driver's SQL oracle can recompute the full fingerprint
      (see ``__spark_entry__.oracle_sql``).
    """
    words = _spread(df.select(F.col(id_col).alias("_id"), F.col(text_col))).select(
        "_id",
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("_w"),
    )
    if hash_mode == "md5":
        words = words.withColumn("_hx", F.md5("_w"))
        chunk = [
            F.conv(F.substring("_hx", 1 + 4 * c, 4), 16, 10).cast("int")
            for c in range(4)
        ]
        bit = lambda i: F.shiftright(chunk[i // 16], i % 16).bitwiseAND(F.lit(1))
    else:
        words = words.withColumn("_h", F.xxhash64("_w", F.lit(42)))
        bit = lambda i: F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1))

    bit_sums = [
        F.sum(F.when(bit(i) == 1, 1).otherwise(-1)).alias(f"_b{i}")
        for i in range(64)
    ]
    agg = words.groupBy("_id").agg(*bit_sums)

    fp = F.lit(0).cast("long")
    for i in range(64):
        bit_val = (1 << i) if i < 63 else -(1 << 63)  # bit 63 = int64 sign bit
        fp = fp + F.when(F.col(f"_b{i}") > 0, F.lit(bit_val).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return agg.select(F.col("_id").alias(id_col), fp.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Blocking: split the 64-bit fingerprint into 4 chunks of 16 bits;
    any pair within Hamming 3 shares at least one exact chunk
    (pigeonhole), so candidates come from 4 cheap equi-joins, never a
    cross join.
    """
    fps = simhash(df, id_col, text_col)
    chunks = fps.select(
        F.col(id_col).alias("_id"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cval"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("_c"),
    ).select("_id", "simhash", "_c.chunk", "_c.cval")

    a = chunks.select(F.col("_id").alias("id_a"), F.col("simhash").alias("fp_a"), "chunk", "cval")
    b = chunks.select(F.col("_id").alias("id_b"), F.col("simhash").alias("fp_b"), "chunk", "cval")
    cands = (
        a.join(b, ["chunk", "cval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs -> (node, cluster_id).

    The step a training pipeline runs AFTER pair generation: transitive
    closure groups duplicates into clusters so one canonical survivor
    can be kept per cluster (``cluster_id`` = the lexicographic min of
    all reachable ids, the usual deterministic canonical choice).

    Algorithm: min-label propagation over the symmetrized edge list —
    each round every node takes the min of its own label and its
    neighbors' labels; converges in graph-diameter rounds. Near-dup
    clusters are shallow (diameter rarely exceeds a handful of hops),
    so the loop is short; each round is one shuffle of the edge list
    keyed by node. At web scale the same loop holds because the edge
    list is bucket-join output (bounded by the LSH/DF caps upstream),
    not all-pairs; for adversarially long chains swap in the
    alternating large-star/small-star variant (Kiveris et al.), which
    converges in O(log n) rounds over the identical join shape.
    Raises after ``max_iter`` non-converged rounds rather than
    returning a partial closure.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.persist()

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    try:
        for _ in range(max_iter):
            nbr_min = (
                edges.join(labels, edges["src"] == labels["node"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("label").alias("_nbr"))
            )
            new_labels = (
                labels.join(nbr_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce("_nbr", "label")
                    ).alias("label"),
                )
                .persist()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds"
            )
    except BaseException:
        labels.unpersist()
        raise
    finally:
        edges.unpersist()
    # the returned plan still reads the final labels cache; it is
    # released by Spark's ContextCleaner once the caller drops the
    # DataFrame (or explicitly via .unpersist()), so nothing is pinned
    # for the session lifetime
    return labels.select("node", F.col("label").alias("cluster_id"))


def dedup_cluster_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Per-document cluster assignment + canonical-survivor flag.

    Documents absent from every pair are their own singleton cluster.
    ``is_canonical`` marks the one row per cluster a dedup pass keeps
    (the cluster-min id — deterministic, no tie-breaking RNG).
    The join against ``docs`` is broadcast-safe only when the pair set
    is small; at scale it is an equi-join on the id, which AQE plans
    as a shuffled hash join — one shuffle of the doc-id column, never
    of the payload (select the id before joining, as the contract
    query does).
    """
    cc = connected_components(pairs, id_a, id_b)
    out = docs.join(
        cc, docs[id_col] == cc["node"], "left"
    ).select(
        docs[id_col],
        F.coalesce("cluster_id", docs[id_col]).alias("cluster_id"),
    )
    return out.withColumn(
        "is_canonical", F.col(id_col) == F.col("cluster_id")
    )
