"""Build the --py-files artifact: a zip of the log2seq_spark package.

    python tools/build_pyfiles.py [out.zip]     # default dist/log2seq_spark.zip

Ship it to a cluster as
    spark-submit --master <cluster> --py-files dist/log2seq_spark.zip \
        tools/submit.py pipeline --input <turns> --out <dir>
(the north rule's launch protocol; BASELINE.json). Executors import the
package — including the Arrow parse UDF's compiled rule programs — from
the zip; no install step on the nodes.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "log2seq_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "log2seq_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
