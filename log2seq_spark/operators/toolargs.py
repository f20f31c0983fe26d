"""Tool-call argument parsing + validation over the north-rule
transcripts shape — the hygiene pass an agent-trajectory training
pipeline runs on ``tool`` turns before they become training data: is the
argument payload well-formed JSON, does it carry the tool's required
keys, and what does the argument-key census look like per tool.

Everything is JVM-side JSON machinery (``try_parse_json`` /
``json_object_keys`` / ``get_json_object`` — Jackson, no Python), so the
whole pass is map-only until the final bounded per-tool aggregate:
the 10^12-turn shape is one scan + one hash aggregate whose key space
is |tools| (or |tools| × |arg keys| for the census) — never corpus
size. Required-key validation is a broadcast-free ``array_except``
against a literal map (the tool dictionary is code-sized, same as the
pipeline's role/tool enrich dims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_args(turns: DataFrame, *, text_col: str = "text",
               out_prefix: str = "args_") -> DataFrame:
    """→ ``turns`` + ``args_valid:boolean`` (payload parses as JSON) and
    ``args_keys:array<string>`` (outermost object keys; null when
    invalid). Pure map — composes before any aggregate."""
    valid = F.try_parse_json(F.col(text_col)).isNotNull()
    keys = F.json_object_keys(F.col(text_col))
    return (turns.withColumn(f"{out_prefix}valid", valid)
                 .withColumn(f"{out_prefix}keys", keys))


def validate_required(parsed: DataFrame, required: dict[str, list[str]],
                      *, tool_col: str = "tool",
                      keys_col: str = "args_keys",
                      valid_col: str = "args_valid") -> DataFrame:
    """→ ``parsed`` + ``args_missing:array<string>`` (this tool's
    required keys absent from the payload) and ``args_ok:boolean``
    (valid JSON and nothing missing). ``required`` maps tool name →
    required key list; tools not in the map require nothing. The map is
    embedded as a literal (code-sized dictionary — no join, no
    shuffle)."""
    pairs = []
    for tool, keys in sorted(required.items()):
        pairs.append(F.lit(tool))
        pairs.append(F.array(*[F.lit(k) for k in keys]))
    req = (F.element_at(F.create_map(*pairs), F.col(tool_col))
           if pairs else F.lit(None).cast("array<string>"))
    missing = F.when(
        F.col(valid_col),
        F.array_except(F.coalesce(req, F.array().cast("array<string>")),
                       F.coalesce(F.col(keys_col),
                                  F.array().cast("array<string>")))
    ).otherwise(F.coalesce(req, F.array().cast("array<string>")))
    return (parsed.withColumn("args_missing", missing)
                  .withColumn("args_ok",
                              F.col(valid_col)
                              & (F.size("args_missing") == 0)))


def tool_call_stats(validated: DataFrame, *, tool_col: str = "tool",
                    numeric_path: str | None = None,
                    text_col: str = "text") -> DataFrame:
    """Per-tool call digest over :func:`validate_required` output —
    ``(tool, n_calls, n_valid_json, n_ok, sum_num)`` where ``sum_num``
    sums the JSON number at ``numeric_path`` (e.g. ``'$.n'``) across
    rows where ``args_ok`` (0.0 when no path given). Bounded output:
    one hash aggregate keyed by tool."""
    num = (F.when(F.col("args_ok"),
                  F.get_json_object(F.col(text_col), numeric_path)
                   .cast("double")).otherwise(0.0)
           if numeric_path else F.lit(0.0))
    return (validated.groupBy(F.col(tool_col).alias("tool"))
            .agg(F.count("*").alias("n_calls"),
                 F.sum(F.col("args_valid").cast("int")).cast("bigint")
                  .alias("n_valid_json"),
                 F.sum(F.col("args_ok").cast("int")).cast("bigint")
                  .alias("n_ok"),
                 F.sum(F.coalesce(num, F.lit(0.0))).alias("sum_num")))


def arg_key_census(parsed: DataFrame, *, tool_col: str = "tool",
                   keys_col: str = "args_keys") -> DataFrame:
    """Argument-key census — ``(tool, arg_key, n)`` over valid payloads:
    which argument names each tool actually receives (schema-drift /
    misuse detector). Explode of a small per-row key array + one
    bounded aggregate (|tools| × |arg keys|)."""
    return (parsed.filter(F.col(keys_col).isNotNull())
            .select(F.col(tool_col).alias("tool"),
                    F.explode(keys_col).alias("arg_key"))
            .groupBy("tool", "arg_key")
            .agg(F.count("*").alias("n")))
