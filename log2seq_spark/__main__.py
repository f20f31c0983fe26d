"""CLI — the spark-submit-able counterpart of the reference's
``python -m log2seq`` (``/root/reference/log2seq/__main__.py``).

Reads raw log lines (text/gz/bz2 via ``spark.read.text``) or a turns
parquet/Iceberg table, parses with a preset or a user parser script
(a python module exporting a module-global ``program: RuleProgram`` —
the Spark-first analog of the reference's ``parser`` convention,
``_common.py:11``; ship it with ``spark-submit --py-files``), and writes
results or prints a sample. Exit codes mirror the reference: 0 all ok,
1 nothing parsed, 2 partial failures.

Examples:
    python -m log2seq_spark parse --input logs/*.gz --format words
    python -m log2seq_spark pipeline --input turns_parquet --out out/
    python -m log2seq_spark generate --out turns_parquet --convs 10000
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

from pyspark.sql import functions as F


def load_program_script(path: str):
    spec = importlib.util.spec_from_file_location("user_parser_script",
                                                  os.path.abspath(path))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return getattr(mod, "program")


def _program(args):
    if args.parser_script:
        return load_program_script(args.parser_script)
    from .rules import presets
    named = {"default": presets.default_program,
             "apache": presets.apache_errorlog_program,
             "hdfs": presets.hdfs_program,
             "hpc": presets.hpc_program,
             "spark": presets.spark_log_program}
    return named[args.preset]()


def cmd_parse(args) -> int:
    from .session import get_spark
    from .functions.udf import with_parsed
    spark = get_spark(app_name="log2seq-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    if args.input_kind == "text":
        df = spark.read.text(args.input).withColumnRenamed("value", "text")
        ts_col = None
    else:
        df = spark.read.parquet(args.input)
        ts_col = "ts" if "ts" in df.columns else None
    program = _program(args)
    default_year = args.year
    if default_year is None and ts_col is None:
        import datetime
        default_year = datetime.datetime.now().year
    parsed = with_parsed(df, program, text_col="text", ts_col=ts_col,
                         default_year=default_year)
    ok = F.col("parsed.message").isNotNull()
    n_total = parsed.count()
    n_ok = parsed.filter(ok).count()
    n_empty = parsed.filter(F.col("parsed.rule_id") == -2).count()
    n_fail = n_total - n_ok - n_empty

    if args.output:
        out = parsed.select("*", "parsed.*").drop("parsed")
        if args.format == "words":
            out = parsed.filter(ok).select(
                F.array_join("parsed.words", " ").alias("words"))
        out.write.mode("overwrite").parquet(args.output)
    else:
        sample = parsed.filter(ok).limit(args.sample)
        for row in sample.collect():
            p = row["parsed"]
            if args.format == "words":
                print(" ".join(p["words"]))
            else:
                print({k: p[k] for k in p.__fields__ if p[k] is not None})
    print(f"# processed {n_total} lines: {n_ok} ok, {n_fail} failed",
          file=sys.stderr)
    spark.stop()
    if n_ok == 0 and n_total > 0:
        return 1
    if n_fail > 0:
        return 2
    return 0


def cmd_pipeline(args) -> int:
    from .session import get_spark
    from .plans.pipeline import PipelineConfig, run_pipeline
    spark = get_spark(app_name="log2seq-spark-pipeline")
    spark.sparkContext.setLogLevel("WARN")
    turns = spark.read.parquet(args.input)
    cfg = PipelineConfig(out_dir=args.out, n_buckets=args.buckets,
                         program=_program(args), input_id=args.input)
    res = run_pipeline(spark, turns, cfg, resume=not args.no_resume)
    print(f"lineage={res.lineage_id} processed={res.buckets_processed} "
          f"skipped={res.buckets_skipped} metrics={res.metrics}",
          file=sys.stderr)
    spark.stop()
    return 0


def cmd_generate(args) -> int:
    from .session import get_spark
    from .sources.transcripts import write_transcripts
    spark = get_spark(app_name="log2seq-spark-generate")
    spark.sparkContext.setLogLevel("ERROR")
    write_transcripts(spark, args.out, args.convs, seed=args.seed)
    spark.stop()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="log2seq_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("parse", help="parse raw lines or a turns table")
    p.add_argument("--input", required=True)
    p.add_argument("--input-kind", choices=["text", "parquet"], default="text")
    p.add_argument("--output", default=None)
    p.add_argument("--format", choices=["object", "words"], default="object")
    p.add_argument("--sample", type=int, default=10)
    p.add_argument("-p", "--parser-script", default=None)
    p.add_argument("--preset", default="default")
    p.add_argument("--year", type=int, default=None,
                   help="year for year-less headers (raw text inputs "
                        "default to the current year, like the reference)")
    p.set_defaults(fn=cmd_parse)

    p = sub.add_parser("pipeline", help="run parse→enrich→route→aggregate")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("-p", "--parser-script", default=None)
    p.add_argument("--preset", default="default")
    p.set_defaults(fn=cmd_pipeline)

    p = sub.add_parser("generate", help="write the synthetic turns table")
    p.add_argument("--out", required=True)
    p.add_argument("--convs", type=int, default=1000)
    p.add_argument("--seed", type=int, default=42)
    p.set_defaults(fn=cmd_generate)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
