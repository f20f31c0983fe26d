"""Agent-transcript QA operators (operators/agentqa.py): loop-flag
semantics vs a pure-Python model, digit-mask fingerprinting, smallest-
cycle priority, conversation isolation, role-transition validation,
exact-greedy segmentation equality incl. the oversized-turn case, and
digest stability under repartitioning."""

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from log2seq_spark.operators import agentqa


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")


# ---------------------------------------------------------------- loops

def _pure_loop_cycles(rows, max_cycle=3):
    """Reference model: smallest L with fp(t-i)==fp(t-i-L) for i<L."""
    import re
    by_conv = {}
    for c, i, r, t in rows:
        by_conv.setdefault(c, []).append((i, r, t))
    out = {}
    for c, ts in by_conv.items():
        ts.sort()
        fps = [(r + "\x1f" + re.sub(r"[0-9]+", "<*>", t)) for _, r, t in ts]
        for pos, (i, _, _) in enumerate(ts):
            cyc = 0
            for L in range(1, max_cycle + 1):
                if pos - 2 * L + 1 < 0:
                    continue
                if all(fps[pos - k] == fps[pos - k - L] for k in range(L)):
                    cyc = L
                    break
            out[(c, i)] = cyc
    return out


def test_loop_cycle1_and_digit_masking(spark):
    rows = [
        ("a", 1, "assistant", "retry attempt 1"),
        ("a", 2, "assistant", "retry attempt 2"),   # cycle-1 (masked eq)
        ("a", 3, "assistant", "retry attempt 99"),  # cycle-1 again
        ("a", 4, "user", "stop it"),
        ("a", 5, "assistant", "ok done"),
    ]
    got = {(r["conv_id"], r["turn_idx"]): r["loop_cycle"]
           for r in agentqa.loop_flags(_turns(spark, rows)).collect()}
    assert got == {("a", 1): 0, ("a", 2): 1, ("a", 3): 1,
                   ("a", 4): 0, ("a", 5): 0}


def test_loop_cycle2_smallest_wins_and_isolation(spark):
    # a: A B A B -> turn 4 closes an L=2 cycle (and 3 doesn't: only
    # half the cycle matches). c: same texts but conv-isolated.
    rows = [
        ("a", 1, "assistant", "call search"),
        ("a", 2, "tool", "no results"),
        ("a", 3, "assistant", "call search"),
        ("a", 4, "tool", "no results"),
        ("a", 5, "assistant", "give up"),
        ("c", 1, "assistant", "call search"),
        ("c", 2, "tool", "no results"),
    ]
    got = {(r["conv_id"], r["turn_idx"]): r["loop_cycle"]
           for r in agentqa.loop_flags(_turns(spark, rows)).collect()}
    assert got[("a", 3)] == 0 and got[("a", 4)] == 2
    assert got[("a", 5)] == 0
    assert got[("c", 1)] == 0 and got[("c", 2)] == 0
    # A A A A: turn 2+ are cycle-1; L=1 outranks the also-true L=2 at t4
    rows2 = [("z", i, "assistant", "same line") for i in range(1, 5)]
    got2 = {r["turn_idx"]: r["loop_cycle"]
            for r in agentqa.loop_flags(_turns(spark, rows2)).collect()}
    assert got2 == {1: 0, 2: 1, 3: 1, 4: 1}


def test_loop_flags_match_pure_model_randomized(spark):
    rng = random.Random(42)
    rows = []
    for c in range(12):
        n = rng.randint(1, 14)
        for i in range(1, n + 1):
            role = rng.choice(["user", "assistant", "tool"])
            text = rng.choice(["alpha beta", "retry attempt 7",
                               "gamma", "alpha beta", "delta 9 eps"])
            rows.append((f"c{c}", i, role, text))
    want = _pure_loop_cycles(rows)
    got = {(r["conv_id"], r["turn_idx"]): r["loop_cycle"]
           for r in agentqa.loop_flags(_turns(spark, rows)).collect()}
    assert got == want


def test_loop_stats_digest(spark):
    rows = [("a", 1, "assistant", "x"), ("a", 2, "assistant", "x"),
            ("a", 3, "user", "y")]
    st = agentqa.loop_stats(
        agentqa.loop_flags(_turns(spark, rows))).collect()
    assert len(st) == 1
    r = st[0]
    assert (r["n_turns"], r["n_loop_turns"]) == (3, 1)
    assert r["loop_md5"] == hashlib.md5(b"0,1,0").hexdigest()


# ---------------------------------------------------------- transitions

def test_role_transitions(spark):
    rows = [
        ("a", 1, "user", "q"), ("a", 2, "assistant", "a"),
        ("a", 3, "tool", "t"), ("a", 4, "assistant", "a"),
        ("b", 1, "tool", "bad start"), ("b", 2, "user", "bad follow"),
    ]
    got = {(r["prev_role"], r["role"]): (r["n_turns"], r["is_valid"])
           for r in agentqa.role_transitions(_turns(spark, rows)).collect()}
    assert got[("<start>", "user")] == (1, True)
    assert got[("user", "assistant")] == (1, True)
    assert got[("assistant", "tool")] == (1, True)
    assert got[("tool", "assistant")] == (1, True)
    assert got[("<start>", "tool")] == (1, False)
    assert got[("tool", "user")] == (1, False)
    assert sum(n for n, _ in got.values()) == len(rows)


# --------------------------------------------------------- segmentation

def _pure_segments(rows, max_tokens):
    by_conv = {}
    for c, i, _, t in rows:
        by_conv.setdefault(c, []).append((i, len(t.split())))
    out = {}
    for c, ts in by_conv.items():
        ts.sort()
        seg, run = 0, 0
        for i, n in ts:
            if run > 0 and run + n > max_tokens:
                seg, run = seg + 1, n
            else:
                run += n
            out[(c, i)] = (n, seg)
    return out


SEG_ROWS = [
    ("a", 1, "user", "one two three"),            # 3
    ("a", 2, "assistant", "four five"),           # 2 -> seg0 run 5
    ("a", 3, "user", "six seven eight"),          # 3 -> overflow, seg1
    ("a", 4, "assistant",
     "a b c d e f g h i j"),                      # 10 > budget -> seg2
    ("a", 5, "user", "tail"),                     # seg3 (prev run full)
    ("b", 1, "user", "solo"),
]


def test_segment_conversations_exact_greedy(spark):
    got = {(r["conv_id"], r["turn_idx"]): (r["n_tokens"], r["seg_idx"])
           for r in agentqa.segment_conversations(
               _turns(spark, SEG_ROWS), max_tokens=6).collect()}
    assert got == _pure_segments(SEG_ROWS, 6)
    # the oversized turn 4 sits alone in its own segment
    assert got[("a", 4)] == (10, 2)


def test_segment_randomized_and_partition_invariance(spark):
    rng = random.Random(7)
    rows = []
    for c in range(10):
        for i in range(1, rng.randint(2, 20)):
            rows.append((f"c{c}", i, "user",
                         " ".join(["w"] * rng.randint(0, 9))))
    want = _pure_segments(rows, 8)
    df = _turns(spark, rows).repartition(7)
    got = {(r["conv_id"], r["turn_idx"]): (r["n_tokens"], r["seg_idx"])
           for r in agentqa.segment_conversations(
               df, max_tokens=8).collect()}
    assert got == want


def test_segment_stats_digest(spark):
    st = {r["conv_id"]: r for r in agentqa.segment_stats(
        agentqa.segment_conversations(
            _turns(spark, SEG_ROWS), max_tokens=6)).collect()}
    a = st["a"]
    assert a["n_segments"] == 4
    assert a["total_tokens"] == 3 + 2 + 3 + 10 + 1
    assert a["seg_md5"] == hashlib.md5(b"0,0,1,2,3").hexdigest()
    assert st["b"]["n_segments"] == 1
