"""Per-partition (salt-bucket) checkpoint manifest: lineage + metrics.

The pipeline processes the turns table in ``n_buckets`` hash buckets of
``conv_id``. After a successful run, one JSON line per completed bucket is
appended to ``manifest.jsonl`` carrying the lineage id (hash of rule
program + input + bucketing), row/ok/fail counters, and token totals.
Resume = read completed bucket ids for the same lineage and skip them;
partially-written bucket partitions from a crashed run are repaired by
dynamic partition overwrite on the rerun (north rule: "resumable from
checkpoint with per-partition lineage + metrics").
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, List, Set

MANIFEST_NAME = "manifest.jsonl"


# routed-sink schema version: bumped when the routed parquet layout
# changes (v2: precomputed ok/fail/empty flag columns). Folded into the
# lineage id so a resume against an out_dir written by an older layout
# reprocesses cleanly instead of failing mid-read on missing columns.
SINK_SCHEMA_V = 2


def lineage_id(program, input_id: str, n_buckets: int) -> str:
    payload = f"{program!r}|{input_id}|{n_buckets}|s{SINK_SCHEMA_V}"
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_NAME)


def completed_buckets(out_dir: str, lineage: str) -> Set[int]:
    path = manifest_path(out_dir)
    done: Set[int] = set()
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
                          records: List[Dict]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(manifest_path(out_dir), "a") as fh:
        for rec in records:
            rec = dict(rec)
            rec["lineage_id"] = lineage
            fh.write(json.dumps(rec, sort_keys=True) + "\n")


def read_manifest(out_dir: str) -> List[Dict]:
    path = manifest_path(out_dir)
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return [json.loads(x) for x in fh if x.strip()]
