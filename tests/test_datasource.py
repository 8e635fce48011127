"""Tests for the Spark 4 Python DataSource readers (kgforge.datasource).

The byte-range planner must behave like Hadoop text splits: every line
is owned by exactly ONE partition (the one containing its first byte),
regardless of how many partitions are requested — including degenerate
cases (more partitions than bytes, a file smaller than one split).
"""

import os

import pytest

from kgforge.datasource import (
    OpenKEDictDataSource,
    OpenKETriplesDataSource,
    _iter_lines,
    _plan_ranges,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OKE_TXT = os.path.join(REPO, "fixtures", "openke", "txt")


def _read_all(path, n_parts):
    """Replay the split-ownership rule locally: concat of per-range
    iterators in range order."""
    out = []
    for rng in _plan_ranges(path, n_parts):
        out.extend(_iter_lines(path, rng.start, rng.end))
    return out


class TestByteRangePlanning:
    def test_ranges_tile_the_file_exactly(self):
        path = os.path.join(OKE_TXT, "train2id.txt")
        size = os.path.getsize(path)
        for n in (1, 2, 7, 32):
            ranges = _plan_ranges(path, n)
            assert ranges[0].start == 0
            assert ranges[-1].end == size
            for a, b in zip(ranges, ranges[1:]):
                assert a.end == b.start  # disjoint, gap-free

    def test_every_line_read_exactly_once_any_partition_count(self):
        path = os.path.join(OKE_TXT, "train2id.txt")
        with open(path, "rb") as f:
            truth = [ln.decode() for ln in f.read().splitlines(keepends=True)]
        for n in (1, 2, 3, 5, 13, 64):
            assert _read_all(path, n) == truth, f"n_partitions={n}"

    def test_more_partitions_than_bytes(self, tmp_path):
        p = tmp_path / "tiny.txt"
        p.write_text("2\n1 2 3\n4 5 6\n")
        lines = _read_all(str(p), 1000)
        assert lines == ["2\n", "1 2 3\n", "4 5 6\n"]

    def test_file_without_trailing_newline(self, tmp_path):
        p = tmp_path / "notrail.txt"
        p.write_text("1\n7 8 9")
        for n in (1, 2, 8):
            assert _read_all(str(p), n) == ["1\n", "7 8 9"]

    def test_directory_of_shards_plans_per_file(self, tmp_path):
        d = tmp_path / "shards"
        d.mkdir()
        (d / "part-0.txt").write_text("2\n1 2 0\n3 4 1\n")
        (d / "part-1.txt").write_text("1\n5 6 0\n")
        (d / "_SUCCESS").write_text("")  # marker files must be skipped
        (d / "notes.log").write_text("ignore me\n")
        ranges = _plan_ranges(str(d), 4)
        paths = {r.path for r in ranges}
        assert paths == {str(d / "part-0.txt"), str(d / "part-1.txt")}
        lines = []
        for rng in sorted(ranges, key=lambda r: (r.path, r.start)):
            lines.extend(_iter_lines(rng.path, rng.start, rng.end))
        assert lines == ["2\n", "1 2 0\n", "3 4 1\n", "1\n", "5 6 0\n"]


class TestSparkRegistration:
    @pytest.fixture(autouse=True)
    def _register(self, spark):
        for ds in (OpenKETriplesDataSource, OpenKEDictDataSource):
            try:
                spark.dataSource.register(ds)
            except Exception:
                pass  # already registered this session

    def test_triples_match_parquet_twin(self, spark):
        df = (
            spark.read.format("openke_triples")
            .option("path", os.path.join(OKE_TXT, "train2id.txt"))
            .option("partitions", 5)
            .load()
        )
        want = spark.read.parquet(
            os.path.join(REPO, "fixtures", "openke", "train2id.parquet")
        )
        got = {tuple(r) for r in df.collect()}
        assert got == {tuple(r) for r in want.select("h", "t", "r").collect()}
        assert df.rdd.getNumPartitions() == 5

    def test_count_header_is_skipped_not_trusted(self, spark):
        df = (
            spark.read.format("openke_triples")
            .option("path", os.path.join(OKE_TXT, "valid2id.txt"))
            .load()
        )
        with open(os.path.join(OKE_TXT, "valid2id.txt")) as f:
            declared = int(f.readline())
            actual = sum(1 for _ in f)
        assert df.count() == actual == declared

    def test_dict_reader_matches_parquet_twin(self, spark):
        df = (
            spark.read.format("openke_dict")
            .option("path", os.path.join(OKE_TXT, "entity2id.txt"))
            .option("partitions", 3)
            .load()
        )
        want = spark.read.parquet(
            os.path.join(REPO, "fixtures", "openke", "entity2id.parquet")
        )
        assert {tuple(r) for r in df.collect()} == {
            tuple(r) for r in want.select("name", "id").collect()
        }

    def test_directory_batch_read(self, spark, tmp_path):
        d = tmp_path / "txt_dir"
        d.mkdir()
        (d / "part-0.txt").write_text("2\n1 2 0\n3 4 1\n")
        (d / "part-1.txt").write_text("1\n5 6 0\n")
        df = (
            spark.read.format("openke_triples")
            .option("path", str(d))
            .option("partitions", 4)
            .load()
        )
        assert {tuple(r) for r in df.collect()} == {(1, 2, 0), (3, 4, 1), (5, 6, 0)}

    def test_missing_path_raises(self, spark):
        with pytest.raises(Exception, match="path"):
            spark.read.format("openke_triples").load().count()


class TestStreamingTail:
    def test_tail_picks_up_appends_and_new_files(self, spark, tmp_path):
        from kgforge.datasource import OpenKETriplesStreamDataSource

        try:
            spark.dataSource.register(OpenKETriplesStreamDataSource)
        except Exception:
            pass
        d = tmp_path / "stream_in"
        d.mkdir()
        (d / "a.txt").write_text("2\n1 2 0\n3 4 1\n")

        st = (
            spark.readStream.format("openke_triples_stream")
            .option("path", str(d))
            .load()
        )
        q = (
            st.writeStream.format("memory")
            .queryName("tail_test")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {tuple(r) for r in spark.table("tail_test").collect()}
            assert got == {(1, 2, 0), (3, 4, 1)}

            # append to the existing file (one complete, one partial line)
            with open(d / "a.txt", "a") as f:
                f.write("5 6 0\n7 8")  # "7 8" has no newline yet
            # and drop a brand-new file
            (d / "b.txt").write_text("1\n9 9 2\n")
            q.processAllAvailable()
            got = {tuple(r) for r in spark.table("tail_test").collect()}
            assert (5, 6, 0) in got and (9, 9, 2) in got
            assert not any(r[0] == 7 for r in got)  # partial line held back

            # complete the partial line
            with open(d / "a.txt", "a") as f:
                f.write(" 1\n")
            q.processAllAvailable()
            got = {tuple(r) for r in spark.table("tail_test").collect()}
            assert (7, 8, 1) in got
            # nothing double-read: 4 data rows in a.txt + 1 in b.txt
            assert spark.table("tail_test").count() == 5
        finally:
            q.stop()


def test_split_ownership_property_random():
    """Property (hypothesis): for ANY file content (weird lines, blank
    lines, missing trailing newline, multi-byte chars) and ANY
    partition count, concatenating the per-range readers in range
    order reproduces the file's lines exactly once — the Hadoop text
    split ownership rule has no edge cases."""
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    lines_s = st.lists(
        st.text(alphabet="ab 12é\t", max_size=8).map(lambda s: s.replace("\n", "")),
        max_size=12,
    )

    @given(lines=lines_s, trailing=st.booleans(), n=st.integers(1, 40))
    @settings(max_examples=200, deadline=None)
    def check(lines, trailing, n):
        body = "\n".join(lines) + ("\n" if trailing and lines else "")
        with tempfile.NamedTemporaryFile(
            "w", suffix=".txt", delete=False, encoding="utf-8"
        ) as f:
            f.write(body)
            path = f.name
        try:
            got = "".join(_read_all(path, n))
            assert got == body, (lines, trailing, n)
        finally:
            os.unlink(path)

    check()
