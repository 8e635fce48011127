"""Custom PySpark DataSource for the OpenKE text formats — the
"sources" layer done Spark-natively (Spark 4's Python DataSource API),
so OpenKE-style corpora plug straight into ``spark.read.format(...)``
instead of a driver-side pandas import.

Formats (public OpenKE benchmark layout):

* ``train2id.txt`` / ``valid2id.txt`` / ``test2id.txt`` — first line a
  row count, then ``h t r`` space-separated int rows.
* ``entity2id.txt`` / ``relation2id.txt`` — count header, then
  ``name\\tid`` rows.

Scale design: the reader plans BYTE-RANGE partitions (like Hadoop text
splits): each partition seeks to its offset, aligns forward to the
next newline (the partition owning an offset reads the line that
STARTS inside it), and stops at the first line boundary past its end.
No partition ever reads the whole file; adding partitions is O(1)
planning. The count header is consumed by the partition that owns
byte 0 and cross-checked against nothing at read time (the planner
never trusts it — malformed counts can't truncate data).

Usage::

    spark.dataSource.register(OpenKETriplesDataSource)
    df = (spark.read.format("openke_triples")
          .option("path", ".../train2id.txt").load())
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _ByteRange(InputPartition):
    def __init__(self, start: int, end: int, path: str | None = None):
        self.start = start
        self.end = end
        self.path = path


def _iter_lines(path: str, start: int, end: int) -> Iterator[str]:
    """Yield the lines whose FIRST byte lies in [start, end): the
    standard text-split ownership rule — seek, align forward to the
    next newline (unless at 0), then read whole lines until the cursor
    passes ``end``."""
    with open(path, "rb") as f:
        if start > 0:
            # Peek at the byte before the split: if it is NOT a newline we
            # are mid-line, and that line belongs to the previous split
            # (which reads any line STARTING before its end to completion).
            # If it IS a newline, a fresh line starts exactly at `start`
            # and we own it — skipping unconditionally would drop every
            # line that happens to begin on a split boundary.
            f.seek(start - 1)
            if f.read(1) != b"\n":
                f.readline()
        pos = f.tell()
        while pos < end:
            line = f.readline()
            if not line:
                break
            yield line.decode("utf-8")
            pos = f.tell()


def _plan_ranges(path: str, n_partitions: int) -> list[_ByteRange]:
    """Byte-range splits for one file, or per-file splits for a
    directory of ``.txt`` shards (the sink's output layout) — splits
    are spread across files proportionally, one split minimum each."""
    if os.path.isdir(path):
        files = sorted(
            f for f in os.listdir(path)
            if f.endswith(".txt") and not f.startswith("_")
        )
        per_file = max(1, int(n_partitions) // max(1, len(files)))
        out: list[_ByteRange] = []
        for f in files:
            fp = os.path.join(path, f)
            out.extend(
                _ByteRange(r.start, r.end, fp)
                for r in _plan_ranges(fp, per_file)
            )
        return out
    size = os.path.getsize(path)
    n = max(1, int(n_partitions))
    step = max(1, size // n)
    cuts = list(range(0, size, step)) + [size]
    return [_ByteRange(a, b, path) for a, b in zip(cuts, cuts[1:]) if b > a]


class OpenKETriplesDataSource(DataSource):
    """``spark.read.format("openke_triples")`` — distributed reader for
    OpenKE ``*2id.txt`` triple files (count header + ``h t r`` rows).

    Options: ``path`` (required), ``partitions`` (default 8)."""

    @classmethod
    def name(cls) -> str:
        return "openke_triples"

    def schema(self) -> str:
        return "h bigint, t bigint, r bigint"

    def reader(self, schema) -> "_TriplesReader":
        return _TriplesReader(self.options)


class _TriplesReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("openke_triples: option 'path' is required")
        self.n = int(options.get("partitions", 8))

    def partitions(self):
        return _plan_ranges(self.path, self.n)

    def read(self, part: _ByteRange):
        for line in _iter_lines(part.path or self.path, part.start, part.end):
            cells = line.split()
            if len(cells) != 3:
                continue  # the count header (1 cell) or blank tail
            yield int(cells[0]), int(cells[1]), int(cells[2])


class OpenKEDictDataSource(DataSource):
    """``spark.read.format("openke_dict")`` — reader for OpenKE
    ``entity2id.txt`` / ``relation2id.txt`` (count header +
    ``name\\tid`` rows). Same byte-range planning as the triples
    reader."""

    @classmethod
    def name(cls) -> str:
        return "openke_dict"

    def schema(self) -> str:
        return "name string, id bigint"

    def reader(self, schema) -> "_DictReader":
        return _DictReader(self.options)


class _DictReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("openke_dict: option 'path' is required")
        self.n = int(options.get("partitions", 4))

    def partitions(self):
        return _plan_ranges(self.path, self.n)

    def read(self, part: _ByteRange):
        for line in _iter_lines(self.path, part.start, part.end):
            cells = line.rstrip("\n").split("\t")
            if len(cells) != 2:
                continue
            yield cells[0], int(cells[1])


class OpenKETriplesStreamDataSource(DataSource):
    """``spark.readStream.format("openke_triples_stream")`` — tail a
    directory of OpenKE ``*2id.txt`` files as a structured stream.

    Offsets are ``{"files": {name: byte_position}}``: each micro-batch
    consumes the bytes appended since the last offset, cut at the last
    complete line (a half-written line is left for the next batch), and
    newly appearing ``.txt`` files are picked up automatically. Replays
    between committed offsets re-read the exact byte ranges, so the
    source is exactly-once under Spark's offset log.

    This is the *simple* (driver-side) stream reader — the right tool
    for control-plane tailing (dictionary updates, incremental triple
    drops at dictionary scale). Bulk historical loads should go through
    the batch ``openke_triples`` reader, whose byte-range splits fan
    out across executors.
    """

    @classmethod
    def name(cls) -> str:
        return "openke_triples_stream"

    def schema(self) -> str:
        return "h bigint, t bigint, r bigint"

    def simpleStreamReader(self, schema) -> "_TriplesStreamReader":
        return _TriplesStreamReader(self.options)


def _parse_triples(data: bytes):
    for line in data.splitlines():
        cells = line.split()
        if len(cells) != 3:
            continue  # count header (1 cell) or blank line
        yield int(cells[0]), int(cells[1]), int(cells[2])


class _TriplesStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("openke_triples_stream: option 'path' is required")

    def initialOffset(self) -> dict:
        return {"files": {}}

    def _read_range(self, fname: str, start_pos: int, end_pos: int) -> bytes:
        with open(os.path.join(self.dir, fname), "rb") as f:
            f.seek(start_pos)
            return f.read(end_pos - start_pos)

    def read(self, start: dict):
        seen = dict(start.get("files", {}))
        end = {"files": dict(seen)}
        rows: list[tuple[int, int, int]] = []
        for fname in sorted(os.listdir(self.dir)):
            if not fname.endswith(".txt"):
                continue
            prev = int(seen.get(fname, 0))
            with open(os.path.join(self.dir, fname), "rb") as f:
                f.seek(prev)
                data = f.read()
            cut = data.rfind(b"\n") + 1  # whole lines only
            if cut > 0:
                rows.extend(_parse_triples(data[:cut]))
                end["files"][fname] = prev + cut
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        s = start.get("files", {})
        rows: list[tuple[int, int, int]] = []
        for fname, end_pos in sorted(end.get("files", {}).items()):
            prev = int(s.get(fname, 0))
            if int(end_pos) > prev:
                rows.extend(
                    _parse_triples(self._read_range(fname, prev, int(end_pos)))
                )
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint log
