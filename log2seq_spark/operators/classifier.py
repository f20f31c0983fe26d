"""FastText-style hashed n-gram linear classifier inference — the
model-based quality filter of modern training-data pipelines (the
public recipe: fastText quality classifiers in LLaMA's and CCNet's
data work, FineWeb-Edu's educational-quality scorer) — plus the
matching trainer: scoring 10^12 documents under a fixed linear model
is map-only work, and :func:`train_classifier` fits that model by
distributed full-batch logistic GD over a labeled set (cost bounded by
the labeled set, never the corpus).

Model: tokens → lowercased bigrams → hash-bucketed into ``dim``
features (md5-prefix → bigint, the repo's established engine-portable
hash — Spark ``conv(substring(md5(x),1,15),16,10)`` ≡ DuckDB
``('0x' || substr(md5(x),1,15))::BIGINT``, both exact below 2^60) →
mean of per-bucket weights → sigmoid.

Two weight sources:

* ``weights=`` a ``(bucket, weight)`` DataFrame — the real-model path:
  ``dim`` rows, broadcast-joined against the exploded gram frame.
* ``weights=None`` — deterministic pseudo-weights derived from the
  bucket id + ``seed`` (md5 again, uniform in [-0.5, 0.5)). A fixed
  fake model with real plumbing: the tests assert the join path and
  the expression path agree bit-for-bit, and the DuckDB oracle replays
  the scores exactly.

Scale shape (100 TB): one explode of per-doc bigrams → (optional
broadcast join) → ONE map-side-combinable hash aggregate per doc.
``explode_outer`` keeps gram-less docs (<2 tokens) in the aggregate
with score sigmoid(0)=0.5, no join-back needed. The same
explode-not-array-lambda shape as simhash — the nested
higher-order-function formulation measured ~50× slower there
(interpreted lambdas, no codegen), so it is avoided here from the
start.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_expr

GRAM_SEP = "\x1f"
TWO_POW_60 = float(1 << 60)


def _lower_tokens(text_col):
    return F.transform(tokens_expr(text_col), lambda t: F.lower(t))


def _md5_60(col):
    """First 15 md5 hex chars as bigint — < 2^60, exact, portable."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def bigram_buckets(docs: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text", dim: int = 1024) -> DataFrame:
    """Exploded ``(id_col, bucket)`` — one row per token bigram, bucket
    in [0, dim); docs with <2 tokens keep one null-bucket row so every
    doc reaches the downstream aggregate."""
    toks = _lower_tokens(F.col(text_col))
    staged = docs.select(F.col(id_col), toks.alias("_w"))
    n = F.size("_w")
    m = F.greatest(n - 1, F.lit(0))
    grams = F.zip_with(F.slice("_w", 1, m), F.slice("_w", 2, m),
                       lambda a, b: F.concat(a, F.lit(GRAM_SEP), b))
    return (staged.select(id_col, F.explode_outer(grams).alias("_g"))
                  .select(id_col,
                          F.when(F.col("_g").isNotNull(),
                                 F.pmod(_md5_60(F.col("_g")), F.lit(dim)))
                           .alias("bucket")))


def pseudo_weight(bucket_col, seed: str = "clf-v1"):
    """Deterministic weight in [-0.5, 0.5) from (seed, bucket) — the
    fixed fake model (md5-uniform), replayable in ANSI SQL."""
    h = _md5_60(F.concat(F.lit(seed + "|"), bucket_col.cast("string")))
    return h / F.lit(TWO_POW_60) - F.lit(0.5)


def classify(docs: DataFrame, *, id_col: str = "doc_id",
             text_col: str = "text", dim: int = 1024,
             seed: str = "clf-v1",
             weights: DataFrame | None = None) -> DataFrame:
    """Per-doc classifier score: ``(id_col, clf_ngrams, clf_score)``
    with ``clf_score = sigmoid(mean of bucket weights)`` rounded to 6
    places (gram-less docs: 0 grams, score 0.5). One explode + one
    aggregate; the weights join (real-model path) is broadcast."""
    rows = bigram_buckets(docs, id_col=id_col, text_col=text_col, dim=dim)
    if weights is None:
        w = F.when(F.col("bucket").isNotNull(),
                   pseudo_weight(F.col("bucket"), seed))
    else:
        wt = F.broadcast(weights.select(F.col("bucket").alias("_wb"),
                                        F.col("weight").alias("_wv")))
        rows = rows.join(wt, rows["bucket"] == wt["_wb"], "left")
        w = F.when(F.col("bucket").isNotNull(),
                   F.coalesce("_wv", F.lit(0.0)))
    per_doc = (rows.select(id_col, w.alias("_w"))
                   .groupBy(id_col)
                   .agg(F.count("_w").alias("clf_ngrams"),
                        F.sum("_w").alias("_sw")))
    z = F.coalesce(F.col("_sw") / F.greatest("clf_ngrams", F.lit(1)),
                   F.lit(0.0))
    return per_doc.select(
        id_col, "clf_ngrams",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
         .alias("clf_score"))


def doc_features(docs: DataFrame, *, id_col: str = "doc_id",
                 text_col: str = "text", dim: int = 1024) -> DataFrame:
    """Sparse mean-of-one-hot features per document:
    ``(id_col, bucket, x)`` with ``x = count(bucket in doc) /
    n_grams(doc)`` — exactly the feature map :func:`classify` scores
    (score = sigmoid(sum_b w_b·x_b) = sigmoid(mean of per-gram bucket
    weights), so weights trained on these features drop straight into
    ``classify(weights=...)``). Gram-less docs (<2 tokens) are
    excluded: their score is weight-independent (0.5) and they carry
    no gradient."""
    rows = (bigram_buckets(docs, id_col=id_col, text_col=text_col,
                           dim=dim)
            .where(F.col("bucket").isNotNull()))
    counts = rows.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("_c"))
    totals = rows.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    return (counts.join(totals, id_col)
                  .select(id_col, "bucket",
                          (F.col("_c") / F.col("_n")).alias("x")))


def train_classifier(docs: DataFrame, *, label_col: str = "label",
                     id_col: str = "doc_id", text_col: str = "text",
                     dim: int = 1024, iters: int = 30,
                     lr: float = 2.0, l2: float = 0.0) -> DataFrame:
    """Train the fastText-style quality classifier this module scores:
    full-batch logistic-regression gradient descent over the hashed
    bigram mean features, returning the ``(bucket, weight)`` frame
    :func:`classify` consumes. Labels are 0/1 doubles in
    ``label_col``.

    Spark shape: the sparse feature frame (one row per (doc, bucket))
    is built ONCE and persisted; each iteration is two
    map-side-combinable aggregates over it — scores per doc
    (broadcast-join the dim-bounded weights), then gradient per bucket
    (join the per-doc residuals back, one shuffle keyed by the
    labeled-set's doc ids). Cost scales with the LABELED set (typically
    10^5-10^6 docs), never the 10^12-doc corpus the trained weights
    screen; weights (≤ dim rows) are the only thing collected.
    Deterministic: zero init, fixed iteration count, no sampling —
    identical inputs give identical weights up to float-sum order.

    The gradient of mean log-loss with L2 is
    ``g_b = mean_i((p_i - y_i)·x_ib) + l2·w_b``; updates are plain
    ``w -= lr·g``. Mean-of-one-hot features are small (each x_b ≤
    1/n_grams), so gradients are too: on separable quality data
    lr ≈ 10-20 with ~60 iterations gives a solid margin (the unit
    test's setting); tune per set."""
    spark = docs.sparkSession
    feats = doc_features(docs, id_col=id_col, text_col=text_col,
                         dim=dim).persist()
    labels = docs.select(F.col(id_col),
                         F.col(label_col).cast("double").alias("_y"))
    n_docs = labels.count()
    try:
        w = {}          # bucket -> weight, dim-bounded
        for _ in range(iters):
            if w:
                wdf = F.broadcast(spark.createDataFrame(
                    list(w.items()), "bucket bigint, weight double"))
                scored = (feats.join(wdf, "bucket", "left")
                          .withColumn("_wx",
                                      F.coalesce("weight", F.lit(0.0))
                                      * F.col("x")))
            else:
                scored = feats.withColumn("_wx", F.lit(0.0))
            resid = (scored.groupBy(id_col)
                     .agg(F.sum("_wx").alias("_z"))
                     .join(labels, id_col)
                     .select(id_col,
                             (F.lit(1.0)
                              / (F.lit(1.0) + F.exp(-F.col("_z")))
                              - F.col("_y")).alias("_r")))
            grad = (feats.join(resid, id_col)
                    .groupBy("bucket")
                    .agg((F.sum(F.col("x") * F.col("_r"))
                          / F.lit(float(n_docs))).alias("_g"))
                    .collect())
            for r in grad:
                b = r["bucket"]
                w[b] = (w.get(b, 0.0)
                        - lr * (r["_g"] + l2 * w.get(b, 0.0)))
    finally:
        feats.unpersist()
    return spark.createDataFrame(
        sorted(w.items()), "bucket bigint, weight double")
