"""ANN-ingest soak: per-epoch ingestion cost must stay FLAT while the
index grows (each epoch is assign + one segment write, O(batch)), and
compaction must pay for itself at probe time by folding per-epoch
segments/files into size-targeted files per cell.

Drives the REAL surfaces: a base `build_ivf_index`, then K streaming
micro-batches through ``streaming_ann_ingest`` (one availableNow run
per shard over a file source — the checkpointed exactly-once path),
probes via ``ivf_topk_indexed`` off the stamp, then
``compact_ivf_index`` and the same probes again.

Usage: python tools/soak_ann_ingest.py [n_epochs] [vecs_per_epoch] [dim]
Emits one JSON line: per-epoch walls, probe walls pre/post compaction,
segment/file counts, and a sampled probe-equality check vs brute force.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from log2seq_spark.operators import similarity  # noqa: E402
from log2seq_spark.session import get_spark  # noqa: E402
from log2seq_spark.streaming import streaming_ann_ingest  # noqa: E402


def vecs(spark, lo: int, n: int, dim: int):
    """Deterministic unit-ish vectors: component j of vector i is a
    hash-folded float in [-1, 1]."""
    comp = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: ((F.pmod(F.col("vec_id") * 2654435761 + j * 40503,
                           F.lit(2_000_003)) - F.lit(1_000_001))
                   / F.lit(1_000_001.0)).cast("float"))
    return (spark.range(lo, lo + n).withColumnRenamed("id", "vec_id")
                 .select("vec_id", comp.alias("embedding")))


def run(n_epochs: int = 8, per_epoch: int = 250_000, dim: int = 16,
        root: str = "/tmp/ann_soak"):
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(root, ignore_errors=True)
    idx, inp, ck = f"{root}/idx", f"{root}/in", f"{root}/ck"
    base = vecs(spark, 0, per_epoch, dim)
    cents = similarity.kmeans_centroids(base, k=16, n_iter=2)
    similarity.build_ivf_index(base, cents, idx)
    qs = [[float(x) for x in r["embedding"]] for r in
          vecs(spark, 10**9, 3, dim).collect()]

    def probe_wall():
        t0 = time.time()
        for q in qs:
            similarity.ivf_topk_indexed(spark, idx, None, q, k=10,
                                        n_probe=4).collect()
        return round(time.time() - t0, 2)

    walls = []
    for e in range(n_epochs):
        (vecs(spark, (e + 1) * per_epoch, per_epoch, dim)
         .coalesce(4).write.mode("append").parquet(inp))
        t0 = time.time()
        q = (streaming_ann_ingest(
                spark.readStream.schema("vec_id long, embedding array<float>")
                     .parquet(inp), ck, idx)
             .trigger(availableNow=True).start())
        q.awaitTermination(600)
        walls.append(round(time.time() - t0, 2))
        segs = len(similarity.ivf_segment_paths(spark, idx))
        print(f"# epoch {e}: {walls[-1]}s segments={segs}",
              file=sys.stderr)
    pre = probe_wall()
    t0 = time.time()
    # toy-scale cells are ~10 MB; a 4 MB target exercises the
    # size-bucketing (128 MB default would fold to 1 file/cell and
    # strand probe parallelism at n_probe tasks)
    files_before, files_after = similarity.compact_ivf_index(
        spark, idx, target_file_bytes=4 << 20)
    compact_wall = round(time.time() - t0, 2)
    post = probe_wall()
    # sampled correctness: IVF full-probe == brute top-5 for one query
    allv = vecs(spark, 0, (n_epochs + 1) * per_epoch, dim)
    brute = [r["vec_id"] for r in
             similarity.cosine_topk(allv, qs[0], k=5).collect()]
    ivf = [r["vec_id"] for r in
           similarity.ivf_topk_indexed(spark, idx, None, qs[0], k=5,
                                       n_probe=16).collect()]
    print(json.dumps({
        "n_epochs": n_epochs, "vecs_per_epoch": per_epoch, "dim": dim,
        "ingest_walls_s": walls,
        "probe_wall_pre_compact_s": pre,
        "probe_wall_post_compact_s": post,
        "compact_wall_s": compact_wall,
        "files_before": files_before, "files_after": files_after,
        "fullprobe_equals_brute": ivf == brute,
        "last_over_first_ingest_wall": round(
            walls[-1] / max(walls[0], 1e-9), 3)}))
    spark.stop()


if __name__ == "__main__":
    a = sys.argv[1:]
    run(int(a[0]) if a else 8,
        int(a[1]) if len(a) > 1 else 250_000,
        int(a[2]) if len(a) > 2 else 16)
