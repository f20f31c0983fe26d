"""Seed-parameterized synthetic-table generator for the oracle seed
sweep.

Reproduces the SHAPE of the driver's testdata (same table names,
column names, arrow types, value domains and row-count ratios as
``/root/testdata/sf0.01`` — verified against the committed parquet)
under any RNG seed, so ``tools/seed_sweep.py`` can re-run the full
Spark-vs-DuckDB oracle comparison on N fresh datasets instead of the
one committed fixture. This is the gate VERDICT r4 asked for: both
per-round regressions (r3 ``template_mining``, r4
``stratified_sample_counts``) were legs that happened to be green on
the committed seed and flipped on the driver's fresh one.

Only the shape is replicated — the exact per-row values of the
driver's generator are unknown and irrelevant: the correctness gate
compares Spark against DuckDB on the SAME input, whatever it is. What
matters is exercising the code paths, so the generator deliberately
includes the structural features the queries depend on: near-duplicate
and exact-duplicate documents (cluster / leak / dedup legs), the
``dup`` marker token, multi-event users (sessionize), all five event
types, clustered unit-norm embeddings, multi-line ownership via
single-line docs (matching the fixture), and 2-decimal money values.

Usage: python tools/gen_testdata.py OUTDIR SEED [ROWSCALE]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]
STATUSES = ["O", "P", "F"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJ = ["red", "blue", "cold", "hot", "old", "new", "small", "large"]
NOUN = ["bolt", "gear", "widget", "ring", "plate", "anvil", "gizmo",
        "rod"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_P = [0.42, 0.14, 0.13, 0.14, 0.17]
VOCAB = ["join", "hash", "row", "batch", "scan", "column", "customer",
         "filter", "small", "slow", "merge", "order", "vector", "line",
         "data", "table", "agg", "value", "key", "stream", "window",
         "a", "spark", "group", "part", "big", "sort", "query", "fast",
         "the"]

EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
DAY_US = 86_400_000_000


def _money(rng, lo, hi, n):
    return np.round(rng.uniform(lo, hi, n), 2)


def _ts_us(int_us):
    return pa.array(np.asarray(int_us, dtype="int64"),
                    type=pa.timestamp("us"))


def gen(outdir: str, seed: int, rowscale: float = 1.0) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)

    def write(name, table):
        pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))

    n_cust = max(int(1500 * rowscale), 30)
    n_supp = max(int(100 * rowscale), 10)
    n_part = max(int(2000 * rowscale), 40)
    n_ord = max(int(15000 * rowscale), 150)
    n_li_per = 4  # avg lines per order
    n_ev = max(int(10000 * rowscale), 200)
    n_doc = max(int(500 * rowscale), 80)
    n_emb = max(int(500 * rowscale), 80)

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS}))

    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array(rng.integers(0, 5, 25), pa.int32())}))

    write("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": _money(rng, -999, 9999, n_cust),
        "c_mktsegment": [SEGMENTS[i] for i in
                         rng.integers(0, len(SEGMENTS), n_cust)]}))

    write("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": _money(rng, -999, 9999, n_supp)}))

    write("part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{ADJ[a]} {NOUN[b]}" for a, b in
                   zip(rng.integers(0, len(ADJ), n_part),
                       rng.integers(0, len(NOUN), n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [PTYPES[i] for i in
                   rng.integers(0, len(PTYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(
            900.0 + (np.arange(n_part) % 1000) / 10.0, 2)}))

    # orders: dates 1995-01-01 .. 2001-08-01 at midnight
    base = np.datetime64("1995-01-01", "us").astype("int64")
    odays = rng.integers(0, 2405, n_ord)
    o_custkey = rng.integers(0, n_cust, n_ord)
    write("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(o_custkey, pa.int64()),
        "o_orderstatus": [STATUSES[i] for i in
                          rng.integers(0, 3, n_ord)],
        "o_totalprice": _money(rng, 1000, 500000, n_ord),
        "o_orderdate": _ts_us(base + odays * DAY_US),
        "o_orderpriority": [PRIORITIES[i] for i in
                            rng.integers(0, len(PRIORITIES), n_ord)]}))

    # lineitem: 1..7 lines per order
    nlines = rng.integers(1, 2 * n_li_per, n_ord)
    okeys = np.repeat(np.arange(n_ord), nlines)
    n_li = len(okeys)
    linenum = np.concatenate([np.arange(1, k + 1) for k in nlines])
    qty = rng.integers(1, 51, n_li).astype("float64")
    price = np.round(rng.uniform(900, 2100, n_li) * qty, 2)
    write("lineitem", pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": price,
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": [["A", "N", "R"][i] for i in
                         rng.integers(0, 3, n_li)],
        "l_linestatus": [["O", "F"][i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": _ts_us(base + (np.repeat(odays, nlines)
                                     + rng.integers(1, 96, n_li))
                             * DAY_US)}))

    # events: monotone microsecond timestamps over ~30 days
    gaps = rng.exponential(2_592_000_000_000 / n_ev, n_ev).astype("int64")
    ts = EPOCH_2024 + np.cumsum(gaps)
    write("events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": _ts_us(ts),
        "user_id": pa.array(rng.integers(0, max(n_ev // 67, 10), n_ev),
                            pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in
                       rng.integers(0, 5, n_ev)],
        "value": _money(rng, 0.01, 500.0, n_ev),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]}))

    # documents: word salad; ~7% near-dup mutations of an earlier doc,
    # ~2% exact duplicates, ~5% carry the 'dup' marker token
    texts: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.02:
            texts.append(texts[int(rng.integers(0, i))])
            continue
        if i > 10 and r < 0.09:
            words = texts[int(rng.integers(0, i))].split(" ")
            for _ in range(int(rng.integers(1, 4))):
                words[int(rng.integers(0, len(words)))] = \
                    VOCAB[int(rng.integers(0, len(VOCAB)))]
            texts.append(" ".join(words))
            continue
        n_words = int(rng.integers(25, 101))
        words = [VOCAB[j] for j in rng.integers(0, len(VOCAB), n_words)]
        if rng.random() < 0.05:
            words[int(rng.integers(0, n_words))] = "dup"
        texts.append(" ".join(words))
    write("documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in
                 rng.choice(len(LANGS), n_doc, p=LANG_P)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    # embeddings: 10 clusters on the unit sphere, float32, dim 64
    dim, n_clu = 64, 10
    cents = rng.normal(size=(n_clu, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, n_clu, n_emb)
    vecs = cents[labels] + rng.normal(scale=0.25, size=(n_emb, dim))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)) \
        .astype("float32")
    write("embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}))


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    outdir, seed = sys.argv[1], int(sys.argv[2])
    rowscale = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    gen(outdir, seed, rowscale)
    print(f"wrote 10 tables to {outdir} (seed={seed}, "
          f"rowscale={rowscale})")


if __name__ == "__main__":
    main()
