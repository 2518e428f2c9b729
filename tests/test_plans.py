"""Physical-plan audits: the properties that make queries survive a 100x
scale-up are asserted, not assumed — filter pushdown into the parquet
scan, column pruning, broadcast joins for small dims, and the zero-shuffle
partial-build fast path."""

import contextlib
import io

from pyspark.sql import functions as F

from sketchlib.agg import build_partials, hll_spec
from sketchlib.queries import QUERIES


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q6_filters_pushed_to_scan(spark, sf_test):
    plan = plan_of(QUERIES["tpch_q6"](spark, sf_test))
    assert "PushedFilters" in plan
    # every selective predicate reaches the parquet reader
    for token in ("l_shipdate", "l_discount", "l_quantity"):
        pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
        assert any(token in ln for ln in pushed), f"{token} not pushed: {pushed}"
    # scan -> filter -> project -> partial agg collapse into codegen'd
    # spans; under AQE that is only visible on the EXECUTED plan
    df = QUERIES["tpch_q6"](spark, sf_test)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # executed plans mark whole-stage-codegen'd operators with "*(id)"
    assert "*(1)" in executed


def test_q6_column_pruning(spark, sf_test):
    plan = plan_of(QUERIES["tpch_q6"](spark, sf_test))
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    # only the 4 referenced columns are read, not the 16-column table
    assert "l_extendedprice" in read and "l_discount" in read
    assert "l_orderkey" not in read and "l_comment" not in read


def test_star_join_broadcasts_dims(spark, sf_test):
    plan = plan_of(QUERIES["revenue_by_nation"](spark, sf_test), "simple")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan  # the fact table never shuffles to join


def test_build_partials_zero_shuffle(spark, sf_test):
    """The partial-build fast path adds NO exchange: scan partitions are the
    shards (placement-independent algebra)."""
    li = spark.read.parquet(f"{sf_test}/lineitem.parquet")
    partials = build_partials(li, "l_partkey", hll_spec(p=12))
    plan = plan_of(partials, "simple")
    assert "Exchange" not in plan


def test_build_partials_column_pruned(spark, sf_test):
    li = spark.read.parquet(f"{sf_test}/lineitem.parquet")
    plan = plan_of(build_partials(li, "l_partkey", hll_spec(p=12)))
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_partkey" in read and "l_comment" not in read


def test_bloom_semijoin_probe_is_udf_filter_not_join(spark, sf_test):
    """The broadcast-sketch probe is a scan+filter — no join exchange for
    the probe side (the whole point of a bloom semi-join at scale)."""
    plan = plan_of(QUERIES["bloom_semijoin"](spark, sf_test), "simple")
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "ArrowEvalPython" in plan or "pythonUDF" in plan.lower()


def test_jaccard_exact_pairs_no_allpairs_join(spark, sf_test):
    """The exact-Jaccard operator must stay an inverted-index EQUI-join on
    the shingle — an all-pairs (cartesian / nested-loop) plan would be the
    N^2 design that cannot survive any scale-up."""
    plan = plan_of(QUERIES["jaccard_exact_pairs"](spark, sf_test), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mg_verify_filter_pushed_to_scan(spark, sf_test):
    """The MG gate's exact verification only aggregates candidate rows;
    nothing in the plan may materialize a full-corpus distinct or a second
    sketch pass (the CMS gate needs both, which is the point of MG)."""
    plan = plan_of(QUERIES["mg_heavy_tokens"](spark, sf_test), "simple")
    # the candidate IN-filter sits on the exploded tokens, ahead of the agg
    assert "Filter" in plan
    assert "HashAggregate" in plan


def test_kmv_partials_zero_shuffle(spark, sf_test):
    """kmv_bottomk ships only k-entry partials: the ACTUAL mapInPandas stage
    kmv_bottomk builds (exposed as kmv_partials) runs on the scan
    partitioning with no exchange before it."""
    from sketchlib.agg import kmv_partials

    wp = spark.read.parquet(f"{sf_test}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("url"))
    pr = wp.withColumn("prio", F.pmod(F.xxhash64("url"), F.lit(2**40)))
    plan = plan_of(kmv_partials(pr, "url", "prio", 64), "simple")
    assert "MapInPandas" in plan
    assert "Exchange" not in plan


def test_kmv_negative_priority_rejected(spark, sf_test):
    """Negative priorities would silently reverse the uint64 bottom-k order
    — the partial builder must reject them."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from sketchlib.agg import kmv_bottomk

    wp = spark.read.parquet(f"{sf_test}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("url"))
    bad = wp.withColumn("prio", F.lit(-5).cast("long"))
    with pytest.raises((Py4JJavaError, Exception), match="non-negative"):
        kmv_bottomk(bad, "url", "prio", 16)


def test_bloom_prune_join_exact_and_filters_fact_side(spark, sf_test):
    """bloom_prune_join must (a) return exactly the plain join's rows
    (no-false-negative pruning + join removes false positives) and
    (b) place the membership filter on the fact side BEFORE the join —
    the pruned rows never enter the exchange."""
    from sketchlib.agg import bloom_prune_join

    cust = (spark.read.parquet(f"{sf_test}/customer.parquet")
            .where(F.col("c_custkey") % 7 == 0)  # selective dim (~14%)
            .select("c_custkey"))
    orders = spark.read.parquet(f"{sf_test}/orders.parquet") \
        .select("o_custkey", "o_orderkey")
    pruned = bloom_prune_join(orders, "o_custkey", cust, "c_custkey")
    plain = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
    assert pruned.count() == plain.count()
    assert pruned.select(F.sum("o_orderkey")).collect()[0][0] == \
        plain.select(F.sum("o_orderkey")).collect()[0][0]
    plan = plan_of(pruned, "simple")
    # the python membership UDF runs as a filter stage in this plan
    assert ("EvalPython" in plan) or ("pythonUDF" in plan)


def test_weighted_sample_no_global_sort(spark, sf_test):
    """weighted_sample must plan as TakeOrderedAndProject (per-partition
    top-k + k-row merge), never a full Sort+Exchange of the corpus."""
    from sketchlib.agg import weighted_sample

    docs = spark.read.parquet(f"{sf_test}/documents.parquet")
    plan = plan_of(weighted_sample(docs, "doc_id", "n_chars", 50), "simple")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort operator
