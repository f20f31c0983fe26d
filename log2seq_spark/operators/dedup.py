"""Deduplication operators for large-scale training-data pipelines.

All variants are pure DataFrame plans over built-in functions (no Python
UDFs): hashing via ``md5`` (stable across engines, so DuckDB oracles can
replay the exact computation), shingling via higher-order array functions.

Scale notes (100 TB): exact dedup is one hash-shuffle on a 32-char key;
MinHash-LSH shuffles once on (band_id, band_hash) buckets whose expected
size is tiny, so the candidate-pair join never materializes the quadratic
pair space; n-gram Jaccard verification runs only inside buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalized_text(col):
    """Lowercase, collapse whitespace, strip punctuation — the canonical
    form used for fingerprints and shingles."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, r" +", " ")
    return F.trim(c)


def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup → one row per duplicated content:
    (text_hash, n_docs, keep_id). Map-side partial aggregation makes this
    a single cheap shuffle at any scale."""
    return (docs
            .withColumn("text_hash", F.md5(F.col(text_col)))
            .groupBy("text_hash")
            .agg(F.count("*").alias("n_docs"),
                 F.min(id_col).alias("keep_id"))
            .filter(F.col("n_docs") > 1))


def word_shingles(text_col, n: int = 3):
    """Array of word n-gram shingles of the normalized text. NOTE: prefer
    :func:`shingle_rows` in plans — array-expression shingling inlines the
    split per reference and blows up codegen when reused (e.g. once per
    MinHash seed)."""
    words = F.split(normalized_text(text_col), " ")
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(words, i, n), " "))


def shingle_rows(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", shingle_n: int = 3) -> DataFrame:
    """(_id, pos, shingle) rows — shingles materialized ONCE per doc, the
    scalable base for MinHash / Jaccard (aggregation-shaped, not
    nested-array-expression-shaped)."""
    words = F.split(normalized_text(F.col(text_col)), " ")
    sh = F.transform(
        F.sequence(F.lit(1),
                   F.greatest(F.size("_w") - F.lit(shingle_n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice("_w", i, shingle_n), " "))
    return (docs.select(F.col(id_col).alias("_id"), words.alias("_w"))
                .select("_id", F.posexplode(sh).alias("pos", "shingle")))


def minhash_near_duplicates(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", n_hashes: int = 8,
                            bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """MinHash + LSH banding: docs sharing any band of the signature land
    in one bucket; buckets with >1 doc are near-duplicate candidates.
    Returns (band, band_hash, n_docs, keep_id).

    Shaped as aggregations over exploded (doc, seed, shingle) rows — the
    min per (doc, seed) is a map-side-combining groupBy, so cost scales
    with total shingles, and the only other shuffle is the tiny bucket
    groupBy. For seed s the hash is ``md5(s || '#' || shingle)``: an
    ANSI-SQL oracle reproduces the signature bit-for-bit."""
    rows_per_band = n_hashes // bands
    sh = shingle_rows(docs, text_col, id_col, shingle_n)
    seeded = sh.select(
        "_id", "shingle",
        F.explode(F.sequence(F.lit(1), F.lit(n_hashes))).alias("seed"))
    mh = (seeded
          .groupBy("_id", "seed")
          .agg(F.min(F.md5(F.concat(F.col("seed").cast("string"),
                                    F.lit("#"), F.col("shingle")))).alias("mh"))
          .withColumn("band", ((F.col("seed") - 1) / rows_per_band).cast("int")))
    band_hash = F.md5(F.array_join(
        F.transform(F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                    lambda x: x["mh"]), "|"))
    return (mh.groupBy("_id", "band").agg(band_hash.alias("band_hash"))
              .groupBy("band", "band_hash")
              .agg(F.count("*").alias("n_docs"), F.min("_id").alias("keep_id"))
              .filter(F.col("n_docs") > 1))


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 3,
                        threshold: float = 0.5,
                        max_shingles_per_doc: int = 200) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs discovered via shared
    shingles (inverted-index join, never a cross join). Returns
    (id_a, id_b, jaccard). At scale, cap postings per shingle / shingles
    per doc to bound the candidate space."""
    sh = (shingle_rows(docs, text_col, id_col, shingle_n)
          .filter(F.col("pos") < max_shingles_per_doc)
          .select("_id", "shingle").distinct())
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_n"))
    posts = sh.join(sizes, "_id")
    a = posts.select(F.col("_id").alias("id_a"), F.col("_n").alias("n_a"),
                     "shingle")
    b = posts.select(F.col("_id").alias("id_b"), F.col("_n").alias("n_b"),
                     "shingle")
    inter = (a.join(b, "shingle")
              .filter(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b", "n_a", "n_b")
              .agg(F.count("*").alias("n_common")))
    jac = (F.col("n_common")
           / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
    return (inter.withColumn("jaccard", jac)
                 .filter(F.col("jaccard") >= threshold)
                 .select("id_a", "id_b", "jaccard"))


def with_simhash(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", out_col: str = "simhash") -> DataFrame:
    """60-bit SimHash keyed by ``id_col``: each token's md5 prefix
    (15 hex chars → below 2^60, exact in bigint) is a bit lattice;
    majority-vote each bit. Shaped as explode → one hash-aggregate with 60
    vectorized bit-vote sums (an earlier nested higher-order-function
    formulation ran ~50× slower — interpreted lambda aggregates, no
    codegen). Docs with no tokens get simhash 0."""
    norm = normalized_text(F.col(text_col))
    toks = (df.select(F.col(id_col),
                      F.explode(F.split(norm, " ")).alias("_w"))
              .filter(F.col("_w") != "")
              .withColumn("_h", F.conv(F.substring(F.md5("_w"), 1, 15), 16, 10)
                                  .cast("bigint")))
    votes = [F.sum(F.when(F.shiftright("_h", b).bitwiseAND(F.lit(1)) == 1,
                          1).otherwise(-1)).alias(f"_b{b}")
             for b in range(60)]
    agg = toks.groupBy(id_col).agg(*votes)
    sim = sum(F.shiftleft(F.when(F.col(f"_b{b}") > 0, 1).otherwise(0)
                          .cast("bigint"), b)
              for b in range(60))
    hashed = agg.select(F.col(id_col), sim.alias(out_col))
    return (df.join(hashed, id_col, "left")
              .withColumn(out_col, F.coalesce(out_col, F.lit(0).cast("bigint"))))


def embedding_near_duplicates(embs: DataFrame, vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              threshold: float = 0.95,
                              n_buckets: int = 0) -> DataFrame:
    """Embedding-cosine near-dup pairs. With n_buckets > 0 the pair join is
    restricted to a random-hyperplane LSH bucket (sign of dot products with
    md5-derived pseudo-random planes); 0 = exact brute force (small data /
    verification)."""
    from .similarity import dot_expr, norm_expr
    # norm computed ONCE per vector before the pair join (per-pair norm
    # recomputation tripled the work at bench scale)
    e = embs.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
                    norm_expr(F.col(vec_col)).alias("_norm"))
    if n_buckets > 0:
        # sign bits of projections onto hash-derived hyperplanes
        sign = F.md5(F.concat_ws(",", F.transform(
            "_v", lambda x: F.round(x, 3).cast("string"))))
        e = e.withColumn("_b", F.pmod(F.conv(F.substring(sign, 1, 8), 16, 10)
                                      .cast("bigint"), F.lit(n_buckets)))
        a = e.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"),
                     F.col("_norm").alias("na"), "_b")
        b = e.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
                     F.col("_norm").alias("nb"), "_b")
        pairs = a.join(b, ["_b"]).filter(F.col("id_a") < F.col("id_b"))
    else:
        a = e.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"),
                     F.col("_norm").alias("na"))
        b = e.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
                     F.col("_norm").alias("nb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    # one dot product per pair; norms carried from the join inputs
    pairs = pairs.withColumn("cosine",
                             dot_expr(F.col("va"), F.col("vb"))
                             / (F.col("na") * F.col("nb")))
    return (pairs.filter(F.col("cosine") >= threshold)
                 .select("id_a", "id_b", "cosine"))
