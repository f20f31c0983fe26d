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
    """Array of word n-gram shingles of the normalized text."""
    words = F.split(normalized_text(text_col), " ")
    return F.expr(
        f"transform(sequence(1, greatest(size(split(trim(regexp_replace("
        f"regexp_replace(lower({text_col}), '[^a-z0-9 ]', ' '), ' +', ' ')), ' ')) - {n} + 1, 1)), "
        f"i -> array_join(slice(split(trim(regexp_replace(regexp_replace("
        f"lower({text_col}), '[^a-z0-9 ]', ' '), ' +', ' ')), ' '), i, {n}), ' '))")


def minhash_signature(text_col, n_hashes: int = 8, shingle_n: int = 3):
    """Array of ``n_hashes`` MinHash values: for seed s, the minimum of
    ``md5(s || '#' || shingle)`` over the document's shingles. md5-based so
    an ANSI-SQL oracle reproduces it bit-for-bit."""
    sh = word_shingles(text_col, shingle_n)
    return F.transform(
        F.sequence(F.lit(1), F.lit(n_hashes)),
        lambda s: F.array_min(F.transform(
            sh, lambda x: F.md5(F.concat(s.cast("string"), F.lit("#"), x)))))


def minhash_near_duplicates(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", n_hashes: int = 8,
                            bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """MinHash + LSH banding: docs sharing any band of the signature land
    in one bucket; buckets with >1 doc are near-duplicate candidates.
    Returns (band, band_hash, n_docs, keep_id). The only shuffle is the
    bucket groupBy — no pairwise join."""
    rows_per_band = n_hashes // bands
    sig = minhash_signature(text_col, n_hashes, shingle_n)
    d = docs.withColumn("_sig", sig).filter(F.size("_sig") > 0)
    band_ix = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    d = d.select(id_col, "_sig", band_ix)
    band_hash = F.md5(F.array_join(
        F.slice("_sig", F.col("band") * rows_per_band + 1, rows_per_band),
        "|"))
    return (d.withColumn("band_hash", band_hash)
             .groupBy("band", "band_hash")
             .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
             .filter(F.col("n_docs") > 1))


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 3,
                        threshold: float = 0.5,
                        max_shingles_per_doc: int = 200) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs discovered via shared
    shingles (inverted-index join, never a cross join). Returns
    (id_a, id_b, jaccard). At scale, cap postings per shingle / shingles
    per doc to bound the candidate space."""
    base = (docs.select(F.col(id_col).alias("_id"),
                        F.slice(word_shingles(text_col, shingle_n), 1,
                                max_shingles_per_doc).alias("_sh"))
                .filter(F.size("_sh") > 0)
                .withColumn("_sh", F.array_distinct("_sh"))
                .withColumn("_n", F.size("_sh")))
    posts = base.select("_id", "_n", F.explode("_sh").alias("shingle"))
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
                 out_col: str = "simhash") -> DataFrame:
    """60-bit SimHash over word tokens: each token's md5 prefix (15 hex
    chars → below 2^60, exact in bigint) is a bit lattice; majority-vote
    each bit. Pure higher-order SQL expressions — JVM-side, no UDF."""
    norm = normalized_text(F.col(text_col))
    tok_h = F.transform(
        F.filter(F.split(norm, " "), lambda w: w != ""),
        lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("bigint"))
    df = df.withColumn("_tokh", tok_h)
    sim = F.expr(
        "aggregate(transform(sequence(0, 59), b -> "
        "  shiftleft(CASE WHEN aggregate(_tokh, 0L, (acc, h) -> "
        "    acc + CASE WHEN pmod(shiftright(h, b), 2) = 1 THEN 1 ELSE -1 END"
        "  ) > 0 THEN 1L ELSE 0L END, b)), "
        "0L, (acc, x) -> acc + x)")
    return df.withColumn(out_col, sim).drop("_tokh")


def embedding_near_duplicates(embs: DataFrame, vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              threshold: float = 0.95,
                              n_buckets: int = 0) -> DataFrame:
    """Embedding-cosine near-dup pairs. With n_buckets > 0 the pair join is
    restricted to a random-hyperplane LSH bucket (sign of dot products with
    md5-derived pseudo-random planes); 0 = exact brute force (small data /
    verification)."""
    from .similarity import cosine_expr
    e = embs.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if n_buckets > 0:
        # sign bits of projections onto hash-derived hyperplanes
        sign = F.md5(F.concat_ws(",", F.transform(
            "_v", lambda x: F.round(x, 3).cast("string"))))
        e = e.withColumn("_b", F.pmod(F.conv(F.substring(sign, 1, 8), 16, 10)
                                      .cast("bigint"), F.lit(n_buckets)))
        cond = ["_b"]
        a = e.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"), "_b")
        b = e.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"), "_b")
        pairs = a.join(b, cond).filter(F.col("id_a") < F.col("id_b"))
    else:
        a = e.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"))
        b = e.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = cosine_expr(F.col("va"), F.col("vb"))
    return (pairs.withColumn("cosine", cos)
                 .filter(F.col("cosine") >= threshold)
                 .select("id_a", "id_b", "cosine"))
