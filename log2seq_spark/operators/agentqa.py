"""Agent-transcript QA operators over the north-rule transcripts shape
``(conv_id, turn_idx, role, text[, tool])`` — the conversation-level
hygiene checks an LLM training pipeline runs on agent logs before they
become training data:

* **loop detection** — an agent stuck retrying emits the same
  (role, tool, message-template) cycle over and over; flag every turn
  that repeats the immediately preceding cycle of length 1..max_cycle.
* **role-transition validation** — count (prev_role → role) transitions
  per corpus and mark the ones outside the allowed protocol (e.g. a
  ``tool`` turn not preceded by ``assistant``).
* **turn-boundary segmentation** — split each conversation into
  context-window-sized segments at turn boundaries with the exact
  greedy rule (never split a turn; open a new segment when the running
  token total would overflow), the sample constructor for
  long-conversation training.

Scale shape (10^12 turns): every operator shuffles ONCE on ``conv_id``
(the same partitioning the pipeline's salted repartition already
establishes, so in-pipeline composition reuses it). Loop detection is
pure window ``lag`` comparisons (no arrays, no state); transitions are
one lag + a bounded groupBy (key space = |roles|²); segmentation folds
a per-conversation array bounded by conversation length — never corpus
size — with a JVM-side ``aggregate`` HOF (greedy running-total reset is
a sequential recurrence, so it runs inside one row's bounded array, not
across the corpus). No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens_expr

#: (prev_role, role) pairs the default agent protocol allows; "<start>"
#: is the synthetic predecessor of each conversation's first turn.
DEFAULT_ALLOWED_TRANSITIONS = (
    ("<start>", "user"),
    ("user", "assistant"),
    ("assistant", "user"),
    ("assistant", "tool"),
    ("tool", "tool"),
    ("tool", "assistant"),
)


def turn_fingerprint_expr(role_col="role", text_col="text",
                          tool_col: str | None = None):
    """Digit-masked turn fingerprint: md5 over role [, tool] and the
    text with every digit run replaced by ``<*>`` — so "retry attempt 7"
    and "retry attempt 8" fingerprint identically (the loop signal is
    the repeated template, not the literal text)."""
    parts = [F.col(role_col)]
    if tool_col is not None:
        parts.append(F.coalesce(F.col(tool_col), F.lit("")))
    parts.append(F.regexp_replace(F.col(text_col), r"[0-9]+", "<*>"))
    return F.md5(F.concat_ws("\x1f", *parts))


def loop_flags(turns: DataFrame, *, max_cycle: int = 3,
               conv_col: str = "conv_id", idx_col: str = "turn_idx",
               role_col: str = "role", text_col: str = "text",
               tool_col: str | None = None) -> DataFrame:
    """→ ``turns`` + ``loop_cycle:int`` — the smallest L in
    1..``max_cycle`` such that the last L turns ending at this one
    repeat the L turns immediately before them
    (``fp(t-i) == fp(t-i-L)`` for all i in 0..L-1), else 0.

    Window lags only (up to ``2*max_cycle - 1`` of them over one
    conv-partitioned window — one shuffle, no arrays). Near the start
    of a conversation missing lags are NULL, equality with NULL is not
    true, so short prefixes never flag."""
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    staged = turns.withColumn(
        "__fp", turn_fingerprint_expr(role_col, text_col, tool_col))
    lag = {0: F.col("__fp")}
    for d in range(1, 2 * max_cycle):
        lag[d] = F.lag("__fp", d).over(w)
    cyc = F.lit(0)
    # build outermost-last so L=1 is checked first (smallest L wins)
    for L in range(max_cycle, 0, -1):
        cond = None
        for i in range(L):
            c = lag[i] == lag[i + L]
            cond = c if cond is None else (cond & c)
        cyc = F.when(cond, F.lit(L)).otherwise(cyc)
    return staged.withColumn("loop_cycle", cyc.cast("int")).drop("__fp")


def loop_stats(flagged: DataFrame, *, conv_col: str = "conv_id",
               idx_col: str = "turn_idx") -> DataFrame:
    """Per-conversation loop digest over :func:`loop_flags` output —
    ``(conv_col, n_turns, n_loop_turns, loop_md5)`` where ``loop_md5``
    hashes the full loop_cycle sequence in turn order (any missed or
    spurious flag changes it)."""
    seq = F.transform(
        F.array_sort(F.collect_list(F.struct(
            F.col(idx_col).alias("_i"),
            F.col("loop_cycle").alias("_c")))),
        lambda x: x["_c"].cast("string"))
    return (flagged.groupBy(conv_col)
            .agg(F.count("*").alias("n_turns"),
                 F.sum(F.when(F.col("loop_cycle") > 0, 1).otherwise(0))
                  .alias("n_loop_turns"),
                 F.md5(F.concat_ws(",", seq)).alias("loop_md5")))


def role_transitions(turns: DataFrame, *,
                     allowed=DEFAULT_ALLOWED_TRANSITIONS,
                     conv_col: str = "conv_id",
                     idx_col: str = "turn_idx",
                     role_col: str = "role") -> DataFrame:
    """Corpus-wide (prev_role, role) transition counts with protocol
    validation — ``(prev_role, role, n_turns, is_valid)``. The first
    turn of each conversation transitions from ``"<start>"``. One lag
    window + one groupBy whose key space is |roles|² — bounded output
    regardless of corpus size."""
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    prev = F.coalesce(F.lag(role_col).over(w), F.lit("<start>"))
    pairs = turns.select(prev.alias("prev_role"), F.col(role_col).alias("role"))
    ok = [f"{a}\x1f{b}" for a, b in allowed]
    return (pairs.groupBy("prev_role", "role")
            .agg(F.count("*").alias("n_turns"))
            .withColumn("is_valid",
                        F.concat_ws("\x1f", "prev_role", "role").isin(ok)))


def boilerplate_turns(turns: DataFrame, *, min_convs: int = 3,
                      conv_col: str = "conv_id", role_col: str = "role",
                      text_col: str = "text",
                      tool_col: str | None = None) -> DataFrame:
    """Cross-conversation boilerplate detection — turn templates (the
    digit-masked :func:`turn_fingerprint_expr`) that recur across many
    conversations (canned greetings, retry banners, tool preambles):
    ``(fp, n_convs, n_turns, example, is_boilerplate)`` with
    ``is_boilerplate = n_convs >= min_convs``. One hash aggregate on the
    fingerprint (two-phase for the distinct-conv count); output is
    bounded by the number of distinct templates, and ``example`` is the
    lexicographic min text so the row is deterministic."""
    fp = turn_fingerprint_expr(role_col, text_col, tool_col)
    per = turns.select(F.col(conv_col).alias("_c"), fp.alias("fp"),
                       F.col(text_col).alias("_t"))
    return (per.groupBy("fp")
               .agg(F.countDistinct("_c").alias("n_convs"),
                    F.count("*").alias("n_turns"),
                    F.min("_t").alias("example"))
               .withColumn("is_boilerplate",
                           F.col("n_convs") >= F.lit(min_convs)))


def segment_conversations(turns: DataFrame, *, max_tokens: int = 512,
                          conv_col: str = "conv_id",
                          idx_col: str = "turn_idx",
                          text_col: str = "text") -> DataFrame:
    """Exact greedy turn-boundary segmentation —
    ``(conv_col, idx_col, n_tokens, seg_idx)``: walk each conversation
    in turn order keeping a running token total; when adding the next
    turn would exceed ``max_tokens`` (and the current segment is
    non-empty) close the segment and start the next one at that turn.
    A single turn larger than the budget gets its own segment — turns
    are never split.

    The greedy reset is a sequential recurrence, so it cannot be a
    corpus-wide window cumsum; instead each conversation's
    ``(turn_idx, n_tokens)`` list (bounded by conversation length, the
    same bound :mod:`.context` relies on) is folded with one JVM-side
    ``aggregate`` HOF and exploded back to rows. One shuffle
    (groupBy conv), no Python, no driver participation."""
    ntok = F.size(tokens_expr(F.col(text_col)))
    per = turns.select(F.col(conv_col), F.col(idx_col).alias("_i"),
                       ntok.alias("_n"))
    arr = (per.groupBy(conv_col)
              .agg(F.array_sort(F.collect_list(F.struct("_i", "_n")))
                    .alias("_a")))
    zero = F.struct(
        F.lit(0).alias("seg"), F.lit(0).alias("run"),
        F.expr("CAST(array() AS array<struct<i:int,n:int,seg:int>>)")
         .alias("out"))

    def step(acc, x):
        fresh = (acc["run"] > 0) & (acc["run"] + x["_n"] > max_tokens)
        seg = F.when(fresh, acc["seg"] + 1).otherwise(acc["seg"])
        run = F.when(fresh, x["_n"]).otherwise(acc["run"] + x["_n"])
        elem = F.struct(x["_i"].alias("i"), x["_n"].alias("n"),
                        seg.alias("seg"))
        return F.struct(seg.alias("seg"), run.alias("run"),
                        F.concat(acc["out"], F.array(elem)).alias("out"))

    folded = arr.select(conv_col,
                        F.aggregate("_a", zero, step)["out"].alias("_o"))
    ex = folded.select(conv_col, F.explode("_o").alias("_e"))
    return ex.select(conv_col,
                     F.col("_e")["i"].alias(idx_col),
                     F.col("_e")["n"].alias("n_tokens"),
                     F.col("_e")["seg"].alias("seg_idx"))


def segment_stats(segmented: DataFrame, *, conv_col: str = "conv_id",
                  idx_col: str = "turn_idx") -> DataFrame:
    """Per-conversation segmentation digest over
    :func:`segment_conversations` output — ``(conv_col, n_segments,
    total_tokens, seg_md5)``; ``seg_md5`` hashes every turn's assigned
    segment in turn order (any boundary shift changes it)."""
    seq = F.transform(
        F.array_sort(F.collect_list(F.struct(
            F.col(idx_col).alias("_i"), F.col("seg_idx").alias("_s")))),
        lambda x: x["_s"].cast("string"))
    return (segmented.groupBy(conv_col)
            .agg((F.max("seg_idx") + 1).cast("bigint").alias("n_segments"),
                 F.sum("n_tokens").cast("bigint").alias("total_tokens"),
                 F.md5(F.concat_ws(",", seq)).alias("seg_md5")))
