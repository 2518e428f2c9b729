"""Table I/O: snapshot semantics of the parquet Iceberg-emulation
(append-only files + atomic metadata swap + time travel)."""

import pytest

from pyspark.sql import functions as F

from sketchlib.io_iceberg import ParquetTableIO, has_iceberg, table_io
from sketchlib.webtext import webpages


@pytest.fixture()
def io(spark, tmp_path):
    return ParquetTableIO(spark, str(tmp_path / "wh"))


def test_backend_selection(spark, tmp_path):
    # no Iceberg jar in-sandbox -> parquet emulation
    assert not has_iceberg(spark)
    assert isinstance(table_io(spark, str(tmp_path)), ParquetTableIO)


def test_write_read_roundtrip(io, spark, sf_smoke):
    wp = webpages(spark, sf_smoke, canon_only=True)
    sid = io.write("crawl.webpages", wp)
    assert sid == 1
    back = io.read("crawl.webpages")
    assert back.count() == wp.count()
    assert sorted(back.columns) == sorted(wp.columns)


def test_append_and_time_travel(io, spark):
    df1 = spark.range(10).select(F.col("id"))
    df2 = spark.range(10, 25).select(F.col("id"))
    s1 = io.write("t", df1)
    s2 = io.append("t", df2)
    assert [s["snapshot_id"] for s in io.snapshots("t")] == [s1, s2]
    assert io.read("t").count() == 25                      # current
    assert io.read("t", snapshot_id=s1).count() == 10      # time travel
    # overwrite makes a third snapshot; older ones stay readable
    s3 = io.write("t", spark.range(3))
    assert io.read("t").count() == 3
    assert io.read("t", snapshot_id=s2).count() == 25
    assert s3 == 3


def test_missing_table_raises(io):
    with pytest.raises(FileNotFoundError):
        io.read("nope")


def test_unknown_snapshot_raises_cleanly(io, spark):
    io.write("t2", spark.range(5))
    with pytest.raises(ValueError, match="no snapshot 99"):
        io.read("t2", snapshot_id=99)


# ---------------------------------------------------------------------------
# TableIO CONTRACT — one assertion body, every backend.  The emulation is the
# only backend the sandbox can construct (no Iceberg jar, no network —
# verified), but the contract is written against the shared interface, so a
# real catalog backend runs the IDENTICAL assertions the moment it exists;
# divergence between the emulation and the documented interface fails here.
# ---------------------------------------------------------------------------

def _backends(spark, tmp_path):
    from sketchlib.io_iceberg import IcebergTableIO, has_iceberg

    yield "parquet-emulation", ParquetTableIO(spark, str(tmp_path / "wh"))
    if has_iceberg(spark):  # pragma: no cover - needs a real catalog
        yield "iceberg", IcebergTableIO(spark, "spark_catalog")


def test_tableio_contract_all_backends(spark, tmp_path):
    """The documented TableIO contract, assertion by assertion:
    write->snapshot 1, append accumulates, snapshots() is ordered lineage
    with ids matching what write/append returned, time travel returns the
    exact historical rows, old snapshots are IMMUTABLE under later commits,
    and overwrite starts a fresh logical table without destroying history."""
    ran = 0
    for tag, io in _backends(spark, tmp_path):
        ran += 1
        df1 = spark.range(8).select(F.col("id"))
        df2 = spark.range(8, 20).select(F.col("id"))
        s1 = io.write("c.t", df1)
        old_rows = {r["id"] for r in io.read("c.t").collect()}
        s2 = io.append("c.t", df2)
        snaps = io.snapshots("c.t")
        assert [s["snapshot_id"] for s in snaps] == [s1, s2], tag
        assert all("committed_at" in s for s in snaps), tag
        # lineage order == commit order
        assert [s["committed_at"] for s in snaps] == \
            sorted(s["committed_at"] for s in snaps), tag
        # time travel: snapshot s1 returns exactly the pre-append rows
        assert {r["id"] for r in io.read("c.t", snapshot_id=s1).collect()} \
            == old_rows == set(range(8)), tag
        # current = union
        assert io.read("c.t").count() == 20, tag
        # immutability: a later overwrite must not change what s2 returns
        s2_rows = {r["id"] for r in io.read("c.t", snapshot_id=s2).collect()}
        s3 = io.write("c.t", spark.range(100, 103))
        assert {r["id"] for r in io.read("c.t", snapshot_id=s2).collect()} \
            == s2_rows, tag
        assert io.read("c.t").count() == 3, tag
        assert io.snapshots("c.t")[-1]["snapshot_id"] == s3, tag
    assert ran >= 1


def test_emulation_commit_is_atomic_against_torn_writes(spark, tmp_path):
    """The emulation's claim 'atomically-swapped metadata pointer': a
    leftover temp file from a crashed commit must neither corrupt the
    manifest nor surface as a snapshot — readers see the last committed
    state only."""
    import os

    io = ParquetTableIO(spark, str(tmp_path / "wh"))
    s1 = io.write("t", spark.range(5))
    # simulate a crash mid-commit: a stray .tmp next to the manifest
    mpath = io._manifest_path("t")
    with open(mpath + ".deadbeef.tmp", "w") as f:
        f.write('{"snapshots": "GARBAGE')
    assert [s["snapshot_id"] for s in io.snapshots("t")] == [s1]
    assert io.read("t").count() == 5
    # and the next commit still succeeds atomically on top
    s2 = io.append("t", spark.range(5, 9))
    assert io.read("t", snapshot_id=s2).count() == 9


def test_emulation_data_files_append_only(spark, tmp_path):
    """Iceberg data files are immutable; the emulation must never rewrite
    or delete a committed file — every commit only ADDS data files (that
    is what makes time travel and resume-from-snapshot sound)."""
    import os

    io = ParquetTableIO(spark, str(tmp_path / "wh"))
    io.write("t", spark.range(4))

    def data_files():
        out = {}
        for root, _, files in os.walk(tmp_path / "wh" / "t" / "data"):
            for f in files:
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
        return out

    before = data_files()
    io.append("t", spark.range(4, 9))
    io.write("t", spark.range(2))  # overwrite commits NEW files only
    after = data_files()
    assert set(before) <= set(after)
    assert all(after[p] == before[p] for p in before)  # untouched bytes


class TestMetadataRowCount:
    def test_footer_count_matches_scan_count(self, spark, sf_test):
        """parquet_row_count reads only footers — it must agree with a full
        scan for every test table (it feeds Bloom sizing, replacing the
        count() pre-pass that at 100 TB would double scan cost)."""
        from sketchlib.stats import table_row_count

        for name in ("customer", "orders", "documents"):
            scanned = spark.read.parquet(f"{sf_test}/{name}.parquet").count()
            assert table_row_count(sf_test, name) == scanned

    def test_no_spark_needed(self, sf_test):
        """Sizing from metadata is a pure driver-side pyarrow operation —
        callable before any SparkSession exists (hence: zero Spark jobs)."""
        from sketchlib.stats import table_row_count

        assert table_row_count(sf_test, "customer") > 0
