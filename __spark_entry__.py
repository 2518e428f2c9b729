"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship sketch suite at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the training-data-pipeline operators) for the DuckDB
correctness gate.  Implementation lives in ``sketchlib/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SMOKE_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


def _prep(spark: SparkSession) -> None:
    from sketchlib.packaging import ensure_shipped

    ensure_shipped(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build all seven sketch kinds over sf0.001 and return one
    row per sketch with its key estimate and a bound-check flag."""
    import math

    from pyspark.sql import functions as F

    _prep(spark)
    from sketchlib.agg import (bloom_contains_col, bloom_spec, build_sketch,
                               build_sketches, cms_spec, hll_spec, kll_spec,
                               kmv_spec, mg_spec, tdigest_spec)
    from sketchlib.sketch import HLL, KLL, KMV, TDIGEST
    from sketchlib.textops import tokens_col

    sf = SMOKE_DIR
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    rows = []

    # bloom + hll + kll + tdigest + kmv share ONE scan of lineitem
    keys = li.select("l_orderkey").distinct().cache()
    n = keys.count()
    b, h, k, t, v = build_sketches(li, [
        ("l_orderkey", bloom_spec(n, 0.01)),
        ("l_partkey", hll_spec(p=13)),
        ("l_extendedprice", kll_spec(k=200)),
        ("l_extendedprice", tdigest_spec(delta=200)),
        ("l_partkey", kmv_spec(k=512)),
    ])

    # bloom: membership over orderkeys, no false negatives
    fn = keys.where(
        ~bloom_contains_col(spark, b.state_bytes, F.col("l_orderkey"))).count()
    keys.unpersist()
    rows.append(("bloom", float(n), bool(fn == 0)))

    # hll: distinct partkeys
    est = HLL.cardinality(h.state)
    exact = li.select("l_partkey").distinct().count()
    rows.append(("hll", float(est),
                 bool(abs(est - exact) <= max(5 * 1.04 / math.sqrt(2**13) * exact, 3))))

    # kmv: second, independent distinct estimator over the same column
    est_v = KMV.distinct_count(v.state)
    rows.append(("kmv", float(est_v),
                 bool(abs(est_v - exact) <= 5 * KMV.rel_error(v.state) * exact)))

    # cms: token frequencies never undercount
    toks = docs.select(F.explode(tokens_col("text")).alias("token"))
    n_toks = toks.count()
    c = build_sketch(toks, "token", cms_spec(d=5, w=4096))
    rows.append(("cms", float(c.n_rows), bool(c.n_rows == n_toks)))

    # mg: exact-error bound holds and total mass is exact
    m = build_sketch(toks, "token", mg_spec(cap=256))
    rows.append(("mg", float(len(m.state.keys)),
                 bool(m.state.n_total == n_toks
                      and m.state.decr_total <= m.state.n_total / 257)))

    # kll + tdigest: median rank error
    total = li.count()
    med = float(KLL.quantile(k.state, [0.5])[0])
    rank = li.where(F.col("l_extendedprice") <= med).count() / total
    rows.append(("kll", med, bool(abs(rank - 0.5) <= 0.03)))

    med_t = float(TDIGEST.quantile(t.state, [0.5])[0])
    rank_t = li.where(F.col("l_extendedprice") <= med_t).count() / total
    rows.append(("tdigest", med_t, bool(abs(rank_t - 0.5) <= 0.03)))

    return spark.createDataFrame(rows, "sketch string, estimate double, ok boolean")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + pipeline ops)."""
    from sketchlib.queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prep(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-expressible query; omitted keys
    (simhash_pairs, doc_fingerprints, langid_summary, ann_ivf) are
    non-SQL-expressible and get the driver's rows-only check."""
    from sketchlib.queries import ORACLES

    return dict(ORACLES)
