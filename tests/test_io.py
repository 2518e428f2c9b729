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
