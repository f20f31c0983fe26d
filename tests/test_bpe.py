"""BPE tokenizer training + encoding (operators/bpe.py): pure-model vs
driver vs distributed engine equality, encode/train consistency,
reconstruction, determinism, and edge cases."""

import random

import pytest
from pyspark.sql import functions as F

from log2seq_spark.operators import bpe


def _random_corpus(seed, n_docs=60, vocab=("data", "spark", "merge",
                                           "mergers", "sparks", "shuffle",
                                           "shard", "shared", "aa", "aaa",
                                           "abab", "ba")):
    rng = random.Random(seed)
    return [" ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 12)))
            for _ in range(n_docs)]


def _pure_counts(docs):
    from collections import Counter
    c = Counter()
    for d in docs:
        c.update(d.split())
    return dict(c)


class TestBpeTrain:
    def test_driver_engine_matches_pure_model(self, spark):
        docs = _random_corpus(3)
        df = spark.createDataFrame([(d,) for d in docs], "text string")
        got = bpe.bpe_train(df, "text", n_merges=12, engine="driver")
        want = bpe.train_from_counts(_pure_counts(docs), 12)
        assert got == want
        assert 0 < len(got) <= 12

    @pytest.mark.parametrize("seed", [1, 2])
    def test_distributed_engine_matches_driver(self, spark, seed):
        docs = _random_corpus(seed, n_docs=40)
        df = (spark.createDataFrame([(d,) for d in docs], "text string")
                   .repartition(4))
        drv = bpe.bpe_train(df, "text", n_merges=8, engine="driver")
        dist = bpe.bpe_train(df, "text", n_merges=8, engine="distributed")
        assert dist == drv

    def test_distributed_long_run_stays_flat(self, spark):
        # regression: the loop used persist() to "cut lineage", but
        # persist caches data while the aggregate-lambda PLAN keeps
        # nesting — Catalyst re-analysis grew superlinearly and a
        # 24-merge run took >10 minutes before the localCheckpoint
        # fix (~0.3 s/iteration after). The timeout is generous for a
        # loaded CI box; pre-fix this ran effectively forever.
        import time
        docs = _random_corpus(7, n_docs=60)
        df = (spark.createDataFrame([(d,) for d in docs], "text string")
                   .repartition(4))
        t0 = time.monotonic()
        dist = bpe.bpe_train(df, "text", n_merges=24,
                             engine="distributed")
        wall = time.monotonic() - t0
        drv = bpe.bpe_train(df, "text", n_merges=24, engine="driver")
        assert dist == drv
        assert wall < 120, f"distributed merge loop took {wall:.0f}s"

    def test_auto_gate_selects_distributed(self, spark):
        docs = _random_corpus(5, n_docs=20)
        df = spark.createDataFrame([(d,) for d in docs], "text string")
        # distinct words > max_driver_words=1 forces the distributed loop
        got = bpe.bpe_train(df, "text", n_merges=4, max_driver_words=1)
        want = bpe.bpe_train(df, "text", n_merges=4, engine="driver")
        assert got == want

    def test_min_count_stops_early(self, spark):
        # every word unique => after char pairs exhaust min_count, stop
        df = spark.createDataFrame([("aa bb",)], "text string")
        merges = bpe.bpe_train(df, "text", n_merges=10, min_count=2)
        # ('a','a') and ('b','b') each occur once -> below min_count 2
        assert merges == []

    def test_deterministic_tie_break(self):
        # 'ab' and 'cd' tie at count 3; lexicographically smaller pair
        # ('a','b') must win rank 0
        merges = bpe.train_from_counts({"ab": 3, "cd": 3}, 1, min_count=1)
        assert merges == [("a", "b")]

    def test_greedy_leftmost_overlap(self):
        assert bpe._apply_merge(("a", "a", "a"), ("a", "a")) == ("aa", "a")

    def test_engine_validation(self, spark):
        df = spark.createDataFrame([("x",)], "text string")
        with pytest.raises(ValueError):
            bpe.bpe_train(df, "text", engine="bogus")


class TestBpeEncode:
    def test_training_words_reproduce_training_pieces(self, spark):
        docs = _random_corpus(7)
        counts = _pure_counts(docs)
        merges = bpe.train_from_counts(counts, 15, min_count=2)
        # replay training to its final per-word state
        words = {w: tuple(w) for w in counts}
        for m in merges:
            words = {w: bpe._apply_merge(p, m) for w, p in words.items()}
        for w, final in words.items():
            assert bpe.encode_word(w, merges) == final

    def test_spark_encode_matches_pure_and_reconstructs(self, spark):
        docs = _random_corpus(9, n_docs=30)
        df = (spark.createDataFrame(
                  [(i, d) for i, d in enumerate(docs)],
                  "doc_id int, text string")
                   .repartition(3))
        merges = bpe.bpe_train(df, "text", n_merges=10, engine="driver")
        out = {r.doc_id: r.bpe_pieces
               for r in bpe.bpe_encode(df, merges, "text").collect()}
        for i, d in enumerate(docs):
            want = [p for w in d.split()
                    for p in bpe.encode_word(w, merges)]
            assert out[i] == want
            # concatenating pieces reconstructs the token stream
            assert "".join(out[i]) == d.replace(" ", "")

    def test_null_and_empty_text(self, spark):
        df = spark.createDataFrame([(1, None), (2, ""), (3, "ab")],
                                   "doc_id int, text string")
        merges = [("a", "b")]
        out = {r.doc_id: r.bpe_pieces
               for r in bpe.bpe_encode(df, merges, "text").collect()}
        assert out[1] == [] and out[2] == [] and out[3] == ["ab"]

    def test_unseen_word_segments(self):
        merges = bpe.train_from_counts({"shared": 5, "shard": 4}, 6,
                                       min_count=2)
        pieces = bpe.encode_word("sharding", merges)
        assert "".join(pieces) == "sharding"
        assert len(pieces) >= 1
