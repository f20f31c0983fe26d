"""Distributed raw-log-file source via the Python DataSource API
(Spark 4, ``pyspark.sql.datasource``): ``spark.read.format("logtext")``.

The CLI reads tar archives and exotic encodings driver-side (reference
parity, fine for one terminal's worth of logs); THIS source is the
cluster path: every plain/gz/bz2/xz file and every member inside a
tar/tgz/tbz2/txz archive becomes its own input partition, so a directory
of rotated+archived logs decompresses and splits in parallel across
executors. Schema::

    path string, member string, line_no bigint, text string

``line_no`` is 1-based within its (file, member). Options:

* ``path`` — comma-separated files / glob patterns (required);
* ``encoding`` — text decoding, default utf-8 (errors replaced);
* ``members`` — comma-separated fnmatch patterns selecting archive
  members (plain files match on basename) at PLANNING time: unmatched
  members are never decompressed. This replaces the removed
  filter-pushdown pruning (see LogTextReader) with a stateless knob.

Planning opens archives ONCE on the driver for the member list (metadata
only — tar headers, no decompression of content); executors then open
just their own member. This mirrors how Spark's own FileScan plans
splits centrally and reads remotely, expressed through the public
Python DataSource API.

Filesystem visibility: partitions open their file with Python's local
file APIs, so on a multi-node cluster ``path`` must be visible at the
same location on every executor (shared mount: NFS, FUSE-mounted object
store, …) — the Python DataSource worker has no JVM, so the Hadoop
connector stack is not reachable here. For data already on HDFS/S3 as
parquet/text, use Spark's native readers; this source exists for the
raw rotated/archived log-file shape those readers cannot split.
"""

from __future__ import annotations

import glob as _glob
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

_TAR_SUFFIXES = (".tar", ".tar.gz", ".tgz", ".tar.bz2", ".tbz2",
                 ".tar.xz", ".txz")

SCHEMA = "path string, member string, line_no bigint, text string"


@dataclass
class _LogPart(InputPartition):
    path: str
    member: str  # "" for non-archive files
    # positional index into tar.getmembers(): tar -u/--append archives
    # can hold the SAME member name several times, and extractfile(name)
    # resolves to the LAST occurrence — reading by name would emit the
    # newest copy N times and silently drop every earlier copy
    midx: int = -1


def _expand(path_opt: str) -> list[str]:
    """Expand the comma-separated path option, failing FAST (at planning,
    on the driver) for paths that match nothing — a typo'd path should
    not surface as a FileNotFoundError from inside an executor task."""
    import os
    out = []
    for p in path_opt.split(","):
        p = p.strip()
        if not p:
            continue
        hits = sorted(_glob.glob(p))
        if not hits:
            kind = "files match pattern" if _glob.has_magic(p) else "such file"
            raise FileNotFoundError(f"logtext: no {kind}: {p!r}")
        for h in hits:
            if not os.path.isfile(h):
                raise FileNotFoundError(f"logtext: not a regular file: {h!r}")
        out.extend(hits)
    return out


def _open_plain(path: str):
    if path.endswith(".bz2"):
        import bz2
        return bz2.open(path, "rb")
    if path.endswith(".gz"):
        import gzip
        return gzip.open(path, "rb")
    if path.endswith(".xz"):
        import lzma
        return lzma.open(path, "rb")
    return open(path, "rb")


class LogTextReader(DataSourceReader):
    """NO ``pushFilters``, deliberately. Earlier versions pruned archive
    members via filter pushdown; removed after a live-reproduced
    correctness bug: Spark plans a Python data source scan once per
    relation and CACHES the planned partitions, ignoring that the pushed
    filters belonged to one consumer — so ``df.filter(member=...)``
    pruned the partitions for EVERY branch sharing ``df`` (a self-union
    returned 120 of 270 rows, and even ``df.filter(...).count()``
    followed by ``df.count()`` returned the pruned count). Pruning by
    mutating ``partitions()`` output is therefore unsafe for any plan
    that reuses the relation; select members STATELESSLY at planning
    time with the ``members`` option instead (same effect, applied
    uniformly to the whole relation, visible in the read options)."""

    def __init__(self, options):
        self._paths = _expand(options["path"])
        self._encoding = options.get("encoding", "utf-8")
        m = options.get("members")
        self._members = ([p.strip() for p in m.split(",") if p.strip()]
                         if m else None)

    def _member_match(self, name: str) -> bool:
        """fnmatch the ``members`` option patterns against an archive
        member name, or against a plain file's basename (so one option
        uniformly selects across mixed archive/plain inputs)."""
        if self._members is None:
            return True
        import fnmatch
        return any(fnmatch.fnmatchcase(name, pat) for pat in self._members)

    def partitions(self) -> Sequence[InputPartition]:
        import os

        parts: list[InputPartition] = []
        for fp in self._paths:
            if fp.endswith(_TAR_SUFFIXES):
                import tarfile
                with tarfile.open(fp, "r") as tar:
                    for i, info in enumerate(tar.getmembers()):
                        if info.isfile() and self._member_match(info.name):
                            parts.append(_LogPart(fp, info.name, i))
            elif self._member_match(os.path.basename(fp)):
                parts.append(_LogPart(fp, ""))
        if self._members is not None and not parts:
            raise FileNotFoundError(
                f"logtext: no file or archive member matches "
                f"members={self._members!r} under path={self._paths!r}")
        return parts

    def read(self, part: _LogPart) -> Iterator[tuple]:
        if part is None:
            # partitions() returned [] (empty tar): Spark still
            # schedules one default partition
            return
        enc = self._encoding
        if part.member:
            import tarfile
            with tarfile.open(part.path, "r") as tar:
                # extract by POSITION (see _LogPart.midx) — getmembers()
                # order is the archive order, stable across opens
                f = tar.extractfile(tar.getmembers()[part.midx])
                for i, raw in enumerate(f, start=1):
                    yield (part.path, part.member, i,
                           raw.decode(enc, errors="replace").rstrip("\r\n"))
        else:
            with _open_plain(part.path) as f:
                for i, raw in enumerate(f, start=1):
                    yield (part.path, part.member, i,
                           raw.decode(enc, errors="replace").rstrip("\r\n"))


class LogTextDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "logtext"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> LogTextReader:
        return LogTextReader(self.options)


def register(spark) -> None:
    """Idempotently register the ``logtext`` format on this session."""
    spark.dataSource.register(LogTextDataSource)


# ---------------------------------------------------------------------------
# streaming tail-follow source: spark.readStream.format("logtail")
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402

TAIL_SCHEMA = "path string, line_no bigint, text string"


def _tail_entry(v) -> tuple[int, int, int, int | None]:
    """Decode one per-file offset entry → (byte_off, line_count,
    rotation_generation, inode). Accepts the legacy 2-element form from
    pre-rotation-tracking checkpoints (gen 0, inode unknown)."""
    off, lineno = v[0], v[1]
    gen = v[2] if len(v) > 2 else 0
    ino = v[3] if len(v) > 3 else None
    return off, lineno, gen, ino


class LogTailStreamReader(SimpleDataSourceStreamReader):
    """Tail-follow microbatch reader: each batch emits the COMPLETE lines
    appended to any matching plain-text file since the last offset.

    Spark's built-in file stream source only discovers whole NEW files;
    log agents instead append to live files and rotate them — this source
    follows appends. Offsets are a JSON-able dict
    ``{path: [byte_offset, line_count, rotation_generation, inode]}``:
    deterministic replay (``readBetweenOffsets``) re-seeks the recorded
    byte ranges, so a restarted query re-emits a batch byte-identically
    (exactly-once into an idempotent sink). A partial last line (no
    trailing newline yet) is left for the next batch. Glob patterns pick
    up files created after the stream starts.

    Rotation: a shrunken file (copytruncate) or a changed inode
    (logrotate ``create`` mode — even when the replacement is LONGER
    than the recorded offset) reopens the file from byte 0 and bumps the
    entry's ``rotation_generation``. Replay compares generations: a
    batch that crossed a rotation is re-read as bytes ``[0, end_off)``
    of the new file, never skipped — without the generation, an
    ``end < start`` byte range after a reset would silently drop the
    new file's rows from crash recovery."""

    def __init__(self, options):
        self._paths = options["path"]
        self._encoding = options.get("encoding", "utf-8")

    def _files(self):
        out = []
        for p in self._paths.split(","):
            p = p.strip()
            if p:
                hits = sorted(_glob.glob(p))
                out.extend(hits if hits else ([p] if "*" not in p else []))
        return out

    def initialOffset(self) -> dict:
        return {}

    def _read_from(self, start: dict):
        import os
        end = dict(start)
        rows = []
        for fp in self._files():
            try:
                st = os.stat(fp)
            except OSError:
                continue
            size = st.st_size
            off, lineno, gen, ino = _tail_entry(start.get(fp, [0, 0]))
            if size < off or (ino is not None and st.st_ino != ino):
                # truncated in place, or replaced by a new file (inode
                # change catches replacements longer than the old offset,
                # which a size check alone cannot): follow from zero
                off, lineno, gen = 0, 0, gen + 1
            if size == off:
                end[fp] = [off, lineno, gen, st.st_ino]
                continue
            with open(fp, "rb") as f:
                f.seek(off)
                chunk = f.read(size - off)
            # only complete lines; the remainder waits for its newline
            last_nl = chunk.rfind(b"\n")
            if last_nl < 0:
                end[fp] = [off, lineno, gen, st.st_ino]
                continue
            complete = chunk[:last_nl + 1]
            # split on \n ONLY: bytes.splitlines() also splits on bare
            # \r (progress-bar rewrites), inflating line_no and
            # diverging from the batch logtext source over the same
            # bytes; complete ends with \n, so the last piece is empty
            for raw in complete.split(b"\n")[:-1]:
                lineno += 1
                rows.append((fp, lineno,
                             raw.decode(self._encoding, errors="replace")))
            end[fp] = [off + last_nl + 1, lineno, gen, st.st_ino]
        return iter(rows), end

    def read(self, start: dict):
        return self._read_from(start)

    def readBetweenOffsets(self, start: dict, end: dict):
        import os
        rows = []
        for fp, ev in end.items():
            eoff, _elines, egen, _eino = _tail_entry(ev)
            soff, lineno, sgen, _sino = _tail_entry(start.get(fp, [0, 0]))
            if egen != sgen:
                # the batch crossed a rotation: it emitted the NEW file's
                # bytes [0, eoff) with line numbers restarting at 1
                soff, lineno = 0, 0
            if eoff <= soff:
                continue
            # validate the recorded identity BEFORE re-reading: after a
            # rotation during downtime the path holds a DIFFERENT file,
            # and blindly seeking [soff, eoff) would silently emit bytes
            # the original batch never produced — the one thing a
            # byte-identical replay must never do. Fail loudly instead:
            # the original bytes are unrecoverable.
            try:
                st = os.stat(fp)
            except OSError as ex:
                raise RuntimeError(
                    f"logtail replay of {fp} bytes [{soff}, {eoff}) is "
                    f"impossible: the file is gone ({ex}); the original "
                    "batch's bytes are unrecoverable — clear the "
                    "checkpoint (accepting the gap) or restore the "
                    "file") from ex
            if (_eino is not None and st.st_ino != _eino) \
                    or st.st_size < eoff:
                raise RuntimeError(
                    f"logtail replay of {fp} bytes [{soff}, {eoff}) is "
                    "impossible: the file was rotated or truncated "
                    f"during downtime (inode {st.st_ino} vs recorded "
                    f"{_eino}, size {st.st_size}); the original batch's "
                    "bytes are unrecoverable — clear the checkpoint "
                    "(accepting the gap) or restore the file")
            with open(fp, "rb") as f:
                f.seek(soff)
                chunk = f.read(eoff - soff)
            # \n-only split (see _read_from); the recorded eoff is a
            # newline boundary, so the final empty piece is dropped
            for raw in chunk.split(b"\n")[:-1]:
                lineno += 1
                rows.append((fp, lineno,
                             raw.decode(self._encoding, errors="replace")))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass


class LogTailDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "logtail"

    def schema(self) -> str:
        return TAIL_SCHEMA

    def simpleStreamReader(self, schema) -> LogTailStreamReader:
        return LogTailStreamReader(self.options)


def register_tail(spark) -> None:
    """Idempotently register the ``logtail`` streaming format."""
    spark.dataSource.register(LogTailDataSource)
