"""Soak the epoch-state streaming operators (evidence recorded in
BENCH/DELTAS.md; run from the repo root):
 1. near-dup screen: 6 epochs x 40k docs, 30% planted near-dups of the
    previous epoch (one appended token); expect ~all planted flagged.
 2. template mining: 6 epochs x 500k lines from 8 template families;
    expect per-epoch wall flat and profile state size CONSTANT.
"""
import os, shutil, time
from log2seq_spark.session import get_spark
from log2seq_spark.streaming import (streaming_near_dup_with_index,
                                     streaming_template_mining,
                                     current_templates)
from pyspark.sql import functions as F

spark = get_spark(app_name="stream-soak")
spark.sparkContext.setLogLevel("ERROR")
base = "/dev/shm/stream_soak"
shutil.rmtree(base, ignore_errors=True)

E = 40000
def docs_for(e):
    is_dup = (F.pmod("id", F.lit(10)) < 3) if e > 0 else F.lit(False)
    # dups must reference a FRESH row of the previous epoch (a row that
    # was itself a dup had different text): id%10<3 -> id+3 is %10 in
    # 3..5, fresh in every epoch
    seed = F.when(is_dup, F.col("id") + 3 + (e - 1) * E) \
            .otherwise(F.col("id") + e * E)
    toks = F.transform(F.sequence(F.lit(1), F.lit(20)),
                       lambda i: F.concat(F.lit("w"), F.pmod(
                           F.hash(seed * 131 + i), F.lit(10 ** 7))))
    text = F.concat(F.array_join(toks, " "),
                    F.when(is_dup, F.lit(" xtra")).otherwise(F.lit("")))
    return spark.range(E).select(
        (F.col("id") + e * E).alias("doc_id"), text.alias("text"),
        is_dup.alias("planted"))

inp, out, ck, ix = [os.path.join(base, d) for d in ("in", "out", "ck", "ix")]
walls = []
for e in range(6):
    docs_for(e).coalesce(4).write.mode("append").parquet(inp)
    t0 = time.time()
    q = (streaming_near_dup_with_index(
            spark.readStream.schema("doc_id long, text string, planted boolean").parquet(inp),
            out, ck, ix, n_hashes=8, bands=4)
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    walls.append(round(time.time() - t0, 1))
res = spark.read.parquet(out)
agg = res.groupBy("planted", "is_near_dup").count().collect()
tally = {(r["planted"], r["is_near_dup"]): r["count"] for r in agg}
import glob
latest = sorted(glob.glob(os.path.join(ix, "epoch=*")))[-1]
idx_rows = spark.read.parquet(latest).count()
planted = sum(v for (p, _), v in tally.items() if p)
flagged = tally.get((True, True), 0)
false_flags = tally.get((False, True), 0)
fresh = sum(v for (p, _), v in tally.items() if not p)
print(f"NEARDUP walls={walls} planted={planted} flagged={flagged} "
      f"recall={flagged/planted:.4f} false_flag_rate={false_flags/fresh:.5f} "
      f"index_rows={idx_rows}")

# --- template mining soak ---
L = 500000
tin, tck, tprof = [os.path.join(base, d) for d in ("tin", "tck", "tprof")]
def lines_for(e):
    fam = F.pmod("id", F.lit(8))
    n = F.col("id") + e * L
    text = (F.when(fam == 0, F.concat(F.lit("connect from host"), n % 5000))
             .when(fam == 1, F.concat(F.lit("session closed for user"), n % 3000))
             .when(fam == 2, F.concat(F.lit("disk usage at "), n % 100, F.lit(" percent on sda")))
             .when(fam == 3, F.lit("heartbeat ok"))
             .when(fam == 4, F.concat(F.lit("packet drop count "), n % 9999))
             .when(fam == 5, F.concat(F.lit("auth failure for host"), n % 5000, F.lit(" retrying")))
             .when(fam == 6, F.concat(F.lit("cache evicted "), n % 500, F.lit(" entries")))
             .otherwise(F.concat(F.lit("job "), n % 777, F.lit(" finished in "), n % 60, F.lit(" seconds"))))
    return spark.range(L).select(text.alias("text"))
twalls, state_rows = [], []
for e in range(6):
    lines_for(e).coalesce(8).write.mode("append").parquet(tin)
    t0 = time.time()
    q = (streaming_template_mining(
            spark.readStream.schema("text string").parquet(tin), tck, tprof)
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    twalls.append(round(time.time() - t0, 1))
    latest = sorted(glob.glob(os.path.join(tprof, "epoch=*")))[-1]
    state_rows.append(spark.read.parquet(latest).count())
tmpl = current_templates(spark, tprof).collect()
total = sum(r["n_lines"] for r in tmpl)
print(f"TEMPLATES walls={twalls} state_rows={state_rows} "
      f"n_templates={len(tmpl)} lines_covered={total} (expect {6*L})")
for r in sorted(tmpl, key=lambda r: -r["n_lines"])[:10]:
    print("   ", r["template"], r["n_lines"])
spark.stop()
shutil.rmtree(base, ignore_errors=True)
