"""Domain-mixture balancing: deterministic down-/up-sampling so the
kept corpus matches a target domain distribution — the "data mixture"
step of every large-scale pretraining pipeline (e.g. the per-source
weights in public LLM data recipes).

Membership is content-addressed through the same md5 bucketing as
``operators/sampling.py`` (``hash_bucket``), so the balanced corpus is
reproducible across runs, engines, and cluster sizes, and an ANSI-SQL
oracle replays membership exactly.

Scale shape: ONE count aggregate over the domain column (state =
#domains, map-side combinable) to derive rates on the driver-size
frame; the sample itself is a broadcast join of the #domains-row rate
table + a map-side hash filter — no shuffle of the corpus, evaluated
at the scan. Upsampling explodes a per-row ``sequence(1, repeats)``
whose length is the (small, capped) integer repeat factor.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import N_BUCKETS, hash_bucket


def mixture_rates(docs: DataFrame, domain_col: str,
                  targets: Dict[str, float]) -> DataFrame:
    """Per-domain keep rates achieving the target proportions by pure
    down-sampling: ``(domain, n_docs, target_w, rate, threshold)``.

    The binding (scarcest-relative-to-target) domain gets rate 1.0 and
    every other domain is thinned so kept counts are proportional to
    ``targets``. Domains absent from ``targets`` get rate 0 (dropped).
    ``threshold = floor(rate * 10000)`` is the integer bucket cutoff —
    floor (not round) so Spark and any ANSI replay agree bit-for-bit.

    All arithmetic happens in ONE aggregate + a window over the
    #domains-row result; nothing about this frame scales with corpus
    size.
    """
    from pyspark.sql import Window
    if not targets:
        raise ValueError("targets must be non-empty")
    wsum = float(sum(targets.values()))
    tgt = F.create_map(*[x for k, v in targets.items()
                         for x in (F.lit(k), F.lit(float(v) / wsum))])
    counts = (docs.groupBy(F.col(domain_col).alias("domain"))
                  .agg(F.count("*").alias("n_docs"))
                  .withColumn("target_w", tgt[F.col("domain")]))
    # K = min over targeted domains of n_docs / target_w; rate_d =
    # (target_w / n_docs) * K  (== 1 for the binding domain)
    w = Window.partitionBy()
    k_val = F.min(F.when(F.col("target_w").isNotNull(),
                         F.col("n_docs") / F.col("target_w"))).over(w)
    rate = F.when(F.col("target_w").isNull(), F.lit(0.0)).otherwise(
        F.col("target_w") / F.col("n_docs") * k_val)
    return (counts.withColumn("rate", rate)
                  .withColumn("threshold",
                              F.floor(F.col("rate") * N_BUCKETS)
                               .cast("int")))


def balance_mixture(docs: DataFrame, domain_col: str,
                    targets: Dict[str, float], *,
                    id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Deterministically down-sample ``docs`` so kept per-domain counts
    are (bucket-resolution) proportional to ``targets``."""
    rates = mixture_rates(docs, domain_col, targets).select(
        F.col("domain").alias("__mix_domain"),
        F.col("threshold").alias("__mix_thr"))
    return (docs.join(F.broadcast(rates),
                      docs[domain_col] == rates["__mix_domain"], "inner")
                .filter(hash_bucket(F.col(id_col), seed)
                        < F.col("__mix_thr"))
                .drop("__mix_domain", "__mix_thr"))


def upsample_plan(docs: DataFrame, domain_col: str,
                  targets: Dict[str, float], budget_docs: int, *,
                  max_repeats: int = 16) -> DataFrame:
    """Per-domain upsample plan — the #domains-row frame behind
    :func:`upsample_to_budget`: ``(domain, n_docs, target_w,
    r_uncapped, repeats, capped)``. ``capped=true`` names every domain
    whose repeat factor hit ``max_repeats`` — the no-silent-caps
    surface: a capped domain will UNDERSHOOT its target mass, which is
    a data-sourcing problem to fix, not a knob to raise."""
    if budget_docs <= 0:
        raise ValueError("budget_docs must be positive")
    wsum = float(sum(targets.values()))
    tgt = F.create_map(*[x for k, v in targets.items()
                         for x in (F.lit(k), F.lit(float(v) / wsum))])
    counts = (docs.groupBy(F.col(domain_col).alias("domain"))
                  .agg(F.count("*").alias("n_docs"))
                  .withColumn("target_w", tgt[F.col("domain")])
                  .filter(F.col("target_w").isNotNull()))
    r_raw = (F.col("target_w") * F.lit(float(budget_docs))
             / F.col("n_docs"))
    r = F.least(r_raw, F.lit(float(max_repeats)))
    return counts.select(
        "domain", "n_docs", "target_w",
        r_raw.alias("r_uncapped"), r.alias("repeats"),
        (r_raw > F.lit(float(max_repeats))).alias("capped"))


def upsample_to_budget(docs: DataFrame, domain_col: str,
                       targets: Dict[str, float], budget_docs: int, *,
                       id_col: str = "doc_id", seed: int = 0,
                       max_repeats: int = 16) -> DataFrame:
    """Epoch-repeat upsampling: emit each domain's documents enough
    times (whole-corpus epochs + a deterministic fractional sample of
    one more) that the output holds ``budget_docs * target_w`` rows per
    domain. Output = ``docs`` columns + ``epoch:int`` (1-based copy
    index; training shuffles on it later).

    ``repeats`` per domain is capped at ``max_repeats`` — repeating a
    tiny domain hundreds of times is a data-quality bug, not a mixture
    fix. The cap is inspectable, not silent: :func:`upsample_plan`
    returns the per-domain plan with a ``capped`` flag (capped domains
    undershoot their target mass).

    Scale shape: the repeat factor ``r_d = budget * w_d / n_d`` comes
    from the same single #domains-row aggregate; full epochs are a
    ``posexplode(sequence(1, floor(r)))`` whose fan-out is bounded by
    ``max_repeats``; the fractional epoch reuses the md5 bucket filter.
    """
    if "epoch" in docs.columns:
        raise ValueError("input already has an 'epoch' column")
    plan_rows = upsample_plan(docs, domain_col, targets, budget_docs,
                              max_repeats=max_repeats)
    r = F.col("repeats")
    plan = plan_rows.select(
        F.col("domain").alias("__mix_domain"),
        F.floor(r).cast("int").alias("__full_epochs"),
        # fractional epoch as an integer bucket threshold (floor: see
        # mixture_rates' engine-parity note)
        F.floor((r - F.floor(r)) * N_BUCKETS).cast("int").alias("__frac_thr"))
    j = docs.join(F.broadcast(plan),
                  docs[domain_col] == plan["__mix_domain"], "inner")
    full = (j.filter(F.col("__full_epochs") >= 1)
             .select("*", F.posexplode(
                 F.sequence(F.lit(1), F.col("__full_epochs")))
                 .alias("__pos", "epoch"))
             .drop("__pos"))
    frac = (j.filter(hash_bucket(F.col(id_col), seed) < F.col("__frac_thr"))
             .withColumn("epoch", F.col("__full_epochs") + 1))
    cols = docs.columns + ["epoch"]
    return full.select(*cols).unionByName(frac.select(*cols))
