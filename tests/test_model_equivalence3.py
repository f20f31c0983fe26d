"""Randomized pure-Python-model equivalence for the session-3
operators (house style: the Spark plan must match a direct Python
reimplementation on randomized inputs — catches semantics drift the
hand-picked unit cases miss)."""

import datetime as dt
import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from log2seq_spark.operators import (anomaly, eventseq, gapfill,
                                     retrieval, sampling)


def _rank_median(vals):
    # same closed form as anomaly._rank_median: average of the middle
    # one-or-two ranked values (avg of 2 doubles even when they tie)
    s = sorted(vals)
    n = len(s)
    return (s[(n + 1) // 2 - 1] + s[(n + 2) // 2 - 1]) / 2.0


class TestRobustOutliersModel:
    def test_random_groups(self, spark):
        rng = random.Random(42)
        rows = []
        for g in "abcd":
            for _ in range(rng.randint(3, 40)):
                rows.append((g, round(rng.uniform(0, 100), 2)))
        df = spark.createDataFrame(rows, "event_type string, value double")
        got = {(r["event_type"], r["value"], i): r
               for i, r in enumerate(anomaly.robust_outliers(
                   df, "value", ("event_type",)).collect())}
        by_g = {}
        for g, v in rows:
            by_g.setdefault(g, []).append(v)
        model = {}
        for g, vals in by_g.items():
            med = _rank_median(vals)
            mad = _rank_median([abs(v - med) for v in vals])
            model[g] = (med, mad)
        for (g, v, _), r in got.items():
            med, mad = model[g]
            assert r["med"] == pytest.approx(med, abs=0)
            assert r["mad"] == pytest.approx(mad, abs=0)
            if mad > 0:
                z = 0.6745 * (v - med) / mad
                assert r["robust_z"] == pytest.approx(z, rel=1e-12)
                assert r["is_outlier"] == (abs(z) > 3.5)
            else:
                assert r["robust_z"] is None


class TestFillGapsModel:
    def test_random_sparse_series(self, spark):
        rng = random.Random(7)
        rows = []
        series = {}
        for k in "xyz":
            hours = sorted(rng.sample(range(48), rng.randint(1, 10)))
            for h in hours:
                v = round(rng.uniform(-5, 5), 2)
                rows.append((k, dt.datetime(2024, 1, 1) +
                             dt.timedelta(hours=h), v))
                series.setdefault(k, []).append((h, v))
        df = spark.createDataFrame(rows, "key string, ts timestamp, "
                                         "value double")
        got = {(r["key"], r["ts"]): r
               for r in gapfill.fill_gaps(df).collect()}
        n_expected = 0
        for k, obs in series.items():
            obs.sort()
            lo, hi = obs[0][0], obs[-1][0]
            omap = dict(obs)
            for h in range(lo, hi + 1):
                n_expected += 1
                r = got[(k, dt.datetime(2024, 1, 1)
                         + dt.timedelta(hours=h))]
                prevs = [(hh, vv) for hh, vv in obs if hh <= h]
                nexts = [(hh, vv) for hh, vv in obs if hh >= h]
                locf = prevs[-1][1] if prevs else None
                assert r["value_locf"] == locf
                if h in omap:
                    assert r["value"] == omap[h]
                    assert not r["filled"]
                    assert r["value_interp"] == omap[h]
                else:
                    assert r["filled"] and r["value"] is None
                    (ph, pv), (nh, nv) = prevs[-1], nexts[0]
                    want = pv + (nv - pv) * ((h - ph) / (nh - ph))
                    assert r["value_interp"] == pytest.approx(
                        want, rel=1e-12)
        assert len(got) == n_expected


class TestTransitionModel:
    def test_random_streams(self, spark):
        rng = random.Random(5)
        rows = []
        for uid in range(12):
            for i in range(rng.randint(0, 15)):
                rows.append((len(rows), uid,
                             dt.datetime(2024, 1, 1)
                             + dt.timedelta(minutes=rng.randint(0, 500)),
                             rng.choice("abc")))
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, "
                  "event_type string")
        got = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
               for r in eventseq.transition_matrix(df).collect()}
        per_user = {}
        for eid, uid, ts, t in rows:
            per_user.setdefault(uid, []).append((ts, eid, t))
        counts = {}
        for seq in per_user.values():
            seq.sort()
            for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        outgoing = {}
        for (a, _), n in counts.items():
            outgoing[a] = outgoing.get(a, 0) + n
        assert set(got) == set(counts)
        for (a, b), n in counts.items():
            assert got[(a, b)][0] == n
            assert got[(a, b)][1] == pytest.approx(
                round(n / outgoing[a], 6), abs=0)


class TestWeightedSampleModel:
    def test_bit_exact_vs_hashlib(self, spark):
        rng = random.Random(3)
        rows = [(i, round(rng.uniform(0.5, 20), 2)) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        got = [r["doc_id"] for r in
               sampling.weighted_sample(df, 15, "w", seed=9).collect()]

        def key(i, w):
            h = hashlib.md5(f"9#{i}".encode()).hexdigest()
            u = (int(h[:13], 16) + 0.5) / float(16 ** 13)
            return math.log(u) / w
        want = [i for i, _ in sorted(
            rows, key=lambda t: (-key(t[0], t[1]), t[0]))[:15]]
        assert sorted(got) == sorted(want)


class TestRetrievalMetricsModel:
    def test_random_rankings(self, spark):
        rng = random.Random(13)
        res = [(i, round(rng.uniform(0, 1), 6)) for i in range(30)]
        rel = {i: float(rng.randint(1, 3)) for i in
               rng.sample(range(40), 12)}
        rdf = spark.createDataFrame(res, "doc_id long, score double")
        tdf = spark.createDataFrame(list(rel.items()),
                                    "doc_id long, rel double")
        k = 10
        m = retrieval.retrieval_metrics(rdf, tdf, k=k).first()
        ranked = sorted(res, key=lambda t: (-t[1], t[0]))
        top = ranked[:k]
        hits = [i for i, _ in top if i in rel]
        first = next((r + 1 for r, (i, _) in enumerate(ranked[:k])
                      if i in rel), None)
        dcg = sum((2 ** rel.get(i, 0.0) - 1) / math.log2(r + 2)
                  for r, (i, _) in enumerate(top))
        ideal = sorted(rel.values(), reverse=True)[:k]
        idcg = sum((2 ** g - 1) / math.log2(r + 2)
                   for r, g in enumerate(ideal))
        assert m["n_relevant"] == len(rel)
        assert m["recall_at_k"] == pytest.approx(
            len(hits) / len(rel), abs=1e-9)
        assert m["mrr"] == pytest.approx(
            1.0 / first if first else 0.0, abs=1e-9)
        assert m["ndcg_at_k"] == pytest.approx(dcg / idcg, abs=1e-9)
