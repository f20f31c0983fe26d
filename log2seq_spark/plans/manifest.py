"""Per-partition (salt-bucket) checkpoint manifest: lineage + metrics.

The pipeline processes the turns table in ``n_buckets`` hash buckets of
``conv_id``. After a successful run, one record per completed bucket is
committed carrying the lineage id (hash of rule program + input +
bucketing), row/ok/fail counters, and token totals. Resume = read
completed bucket ids for the same lineage and skip them;
partially-written bucket partitions from a crashed run are repaired by
dynamic partition overwrite on the rerun (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

Two physical layouts behind one API, selected by the path:

* **local path** (no URI scheme): one JSON line per record appended to
  ``manifest.jsonl`` — simple, greppable, atomic enough on a POSIX
  driver disk.
* **URI path** (``hdfs://``, ``s3a://``, ``file://``, …): one marker
  FILE per record under ``<out_dir>/manifest/`` named
  ``<lineage>-<bucket>.json``, written through the Hadoop FileSystem
  API. Object stores have no reliable append, so the jsonl protocol
  cannot commit there; per-record files make each bucket commit an
  independent, atomically-visible object, and resume is a directory
  listing. This is the layout a real cluster run (out_dir on shared
  storage) uses; the ``file://`` scheme exercises the same code path
  on local disk in tests.

URI-path calls must pass the SparkSession (the Hadoop conf lives on
it); local-path calls never need it.
"""

from __future__ import annotations

import hashlib
import json
import os
import posixpath
import re
import shutil
from typing import Dict, Iterable, List, Set

from .. import fsio
from ..fsio import is_uri_path

MANIFEST_NAME = "manifest.jsonl"
MANIFEST_DIR = "manifest"

# routed-sink schema version: bumped when the routed parquet layout
# changes (v2: precomputed ok/fail/empty flag columns). Folded into the
# lineage id so a resume against an out_dir written by an older layout
# reprocesses cleanly instead of failing mid-read on missing columns.
SINK_SCHEMA_V = 2


def lineage_id(program, input_id: str, n_buckets: int) -> str:
    payload = f"{program!r}|{input_id}|{n_buckets}|s{SINK_SCHEMA_V}"
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def manifest_path(out_dir: str) -> str:
    if is_uri_path(out_dir):
        return posixpath.join(out_dir, MANIFEST_DIR)
    return os.path.join(out_dir, MANIFEST_NAME)


def _record_name(lineage: str, bucket: int) -> str:
    return f"{lineage}-{int(bucket):06d}.json"


def _manifest_spark(spark, out_dir: str):
    try:
        return fsio.resolve_spark(spark, out_dir)
    except ValueError:
        raise ValueError(
            f"manifest path {out_dir!r} has a filesystem scheme; pass "
            "the SparkSession (spark=) so manifest I/O can go through "
            "the Hadoop FileSystem API") from None


def completed_buckets(out_dir: str, lineage: str,
                      spark=None) -> Set[int]:
    done: Set[int] = set()
    if is_uri_path(out_dir):
        spark = _manifest_spark(spark, out_dir)
        pat = re.compile(re.escape(lineage) + r"-(\d+)\.json$")
        for name in fsio.list_child_names(spark, manifest_path(out_dir)):
            m = pat.fullmatch(name)
            if m:
                done.add(int(m.group(1)))
        return done
    path = manifest_path(out_dir)
    if not os.path.exists(path):
        return done
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if rec.get("lineage_id") == lineage:
                done.add(int(rec["bucket"]))
    return done


def append_bucket_records(out_dir: str, lineage: str,
                          records: List[Dict], spark=None) -> None:
    if is_uri_path(out_dir):
        spark = _manifest_spark(spark, out_dir)
        mdir = manifest_path(out_dir)
        fsio.mkdirs(spark, mdir)
        for rec in records:
            rec = dict(rec)
            rec["lineage_id"] = lineage
            # overwrite: re-committing the same bucket (a rerun that
            # reprocessed it) is idempotent, not an error
            fsio.write_text(
                spark,
                posixpath.join(mdir, _record_name(lineage, rec["bucket"])),
                json.dumps(rec, sort_keys=True) + "\n")
        return
    os.makedirs(out_dir, exist_ok=True)
    with open(manifest_path(out_dir), "a") as fh:
        for rec in records:
            rec = dict(rec)
            rec["lineage_id"] = lineage
            fh.write(json.dumps(rec, sort_keys=True) + "\n")


def read_manifest(out_dir: str, spark=None) -> List[Dict]:
    if is_uri_path(out_dir):
        spark = _manifest_spark(spark, out_dir)
        mdir = manifest_path(out_dir)
        recs: List[Dict] = []
        for name in sorted(fsio.list_child_names(spark, mdir)):
            if not name.endswith(".json"):
                continue
            txt = fsio.read_text(spark, posixpath.join(mdir, name))
            if txt is not None:
                recs.append(json.loads(txt))
        return recs
    path = manifest_path(out_dir)
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return [json.loads(x) for x in fh if x.strip()]


def wipe_outputs(out_dir: str, subdirs: Iterable[str],
                 spark=None) -> None:
    """Remove the pipeline's data subdirs AND the manifest — the
    lineage-switch reset (see run_pipeline: keeping another lineage's
    manifest records while deleting its data would make a later run of
    that lineage "resume" against output that no longer exists)."""
    if is_uri_path(out_dir):
        spark = _manifest_spark(spark, out_dir)
        for sub in list(subdirs) + [MANIFEST_DIR]:
            fsio.delete(spark, posixpath.join(out_dir, sub))
        return
    for sub in subdirs:
        shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
    try:
        os.remove(os.path.join(out_dir, MANIFEST_NAME))
    except OSError:
        pass
