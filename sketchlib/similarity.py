"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — correctness baseline. The numpy matmul
    variant computes scores for ALL queries against a partition's vectors
    in one BLAS call, keeps only the per-partition top-k, and reduces
    top-k globally with one tiny shuffle (k rows per query per partition) —
    the classic scalable brute-force layout.
  * IVF (inverted-file) — scale path: vectors are bucketed by nearest
    centroid (deterministic seeded k-means); queries probe only the
    nearest ``nprobe`` buckets. Partition pruning for vector search.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["cosine_topk", "cosine_pairs", "train_centroids", "ivf_assign",
           "ivf_topk"]


def _collect_queries(query_df: DataFrame, id_col: str, vec_col: str):
    rows = query_df.select(id_col, vec_col).collect()
    qids = np.array([r[id_col] for r in rows], np.int64)
    qmat = np.array([list(r[vec_col]) for r in rows], np.float64)
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    return qids, qnorm


def cosine_topk(df: DataFrame, query_df: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_self: bool = True) -> DataFrame:
    """(q_id, neighbor_id, rnk, sim) — exact cosine top-k of each query
    vector against the corpus.

    Queries are broadcast (small side); each partition computes a
    [n_queries x n_vectors] score block with one matmul and emits only its
    local top-k, so the final shuffle carries k*P rows per query instead of
    the corpus.  Ranks are deterministic: ties broken by neighbor id.
    """
    spark = df.sparkSession
    qids, qnorm = _collect_queries(query_df, id_col, vec_col)
    bc = spark.sparkContext.broadcast((qids, qnorm))

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qnorm_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(np.int64)
            mat = np.array(list(pdf[vec_col]), np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            scores = qnorm_ @ mat.T  # [Q, N]
            if exclude_self:
                self_mask = qids_[:, None] == ids[None, :]
                scores = np.where(self_mask, -np.inf, scores)
            kk = min(k, scores.shape[1])
            # argpartition per query, then exact sort of the k survivors
            part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            rows = []
            for qi in range(len(qids_)):
                idx = part[qi]
                sims = scores[qi, idx]
                keep = np.isfinite(sims)
                rows.append(pd.DataFrame({
                    "q_id": qids_[qi], "neighbor_id": ids[idx[keep]],
                    "sim": sims[keep]}))
            if rows:
                yield pd.concat(rows, ignore_index=True)

    local = df.select(id_col, vec_col).mapInPandas(
        local_topk, "q_id long, neighbor_id long, sim double")
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (local.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("q_id", "neighbor_id", "rnk", "sim"))


def cosine_pairs(df: DataFrame, threshold: float,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(a, b) — all embedding pairs with cosine >= threshold
    (embedding-cosine near-duplicate detection).

    Block self-join: the normalized corpus is broadcast once; every
    partition matmuls its row block against it and emits only the (a < b)
    hits — O(N²) dot products but O(N·k_hits) shuffle.  Exact by
    construction; at 10^12 scale the corpus side becomes the IVF-bucketed
    table (ivf_assign) so each block multiplies against nprobe buckets
    instead of everything."""
    spark = df.sparkSession
    ids, normed = _collect_queries(df, id_col, vec_col)
    bc = spark.sparkContext.broadcast((ids, normed))

    def block_pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, corpus = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids_blk = pdf[id_col].to_numpy(np.int64)
            mat = np.array(list(pdf[vec_col]), np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                                   1e-12)
            scores = mat @ corpus.T  # [B, N]
            hit = (scores >= threshold) & (ids_blk[:, None] < all_ids[None, :])
            bi, ci = np.nonzero(hit)
            if len(bi):
                yield pd.DataFrame({"a": ids_blk[bi], "b": all_ids[ci]})

    return df.select(id_col, vec_col).mapInPandas(block_pairs,
                                                  "a long, b long")


def train_centroids(df: DataFrame, n_centroids: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    iters: int = 3, sample: int = 4096,
                    seed: int = 42) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (IVF coarse
    quantizer). The sample is taken by hash order of ids — stable across
    partitioning."""
    sample_rows = (df.select(id_col, vec_col)
                   .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
                   .limit(sample).collect())
    mat = np.array([list(r[vec_col]) for r in sample_rows], np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    n_centroids = min(n_centroids, len(mat))
    cent = mat[:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_assign(df: DataFrame, centroids: np.ndarray,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Add a ``bucket`` column = nearest centroid (one matmul per batch)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cent = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_col]), np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            pdf = pdf.copy()
            pdf["bucket"] = np.argmax(mat @ cent.T, axis=1).astype(np.int32)
            yield pdf

    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.select(id_col, vec_col).schema.fields)
    return df.select(id_col, vec_col).mapInPandas(
        assign, f"{fields}, bucket int")


def ivf_topk(df: DataFrame, query_df: DataFrame, centroids: np.ndarray,
             k: int = 5, nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", exclude_self: bool = True) -> DataFrame:
    """Approximate cosine top-k: search only the ``nprobe`` buckets nearest
    each query.  At scale the bucketed table is written partitioned by
    ``bucket`` so the scan prunes to nprobe/n_centroids of the corpus."""
    qids, qnorm = _collect_queries(query_df, id_col, vec_col)
    probe = np.argsort(-(qnorm @ centroids.T), axis=1)[:, :nprobe]
    wanted = sorted({int(b) for row in probe for b in row})
    assigned = ivf_assign(df, centroids, id_col, vec_col) \
        .where(F.col("bucket").isin(wanted))
    # restrict each query to its probed buckets at scoring time
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((qids, qnorm, probe))

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qnorm_, probe_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(np.int64)
            buckets = pdf["bucket"].to_numpy(np.int32)
            mat = np.array(list(pdf[vec_col]), np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            scores = qnorm_ @ mat.T
            allowed = np.zeros_like(scores, bool)
            for qi in range(len(qids_)):
                allowed[qi] = np.isin(buckets, probe_[qi])
            if exclude_self:
                allowed &= qids_[:, None] != ids[None, :]
            scores = np.where(allowed, scores, -np.inf)
            kk = min(k, scores.shape[1])
            part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            rows = []
            for qi in range(len(qids_)):
                idx = part[qi]
                sims = scores[qi, idx]
                keep = np.isfinite(sims)
                if keep.any():
                    rows.append(pd.DataFrame({
                        "q_id": qids_[qi], "neighbor_id": ids[idx[keep]],
                        "sim": sims[keep]}))
            if rows:
                yield pd.concat(rows, ignore_index=True)

    local = assigned.mapInPandas(
        local_topk, "q_id long, neighbor_id long, sim double")
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (local.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("q_id", "neighbor_id", "rnk", "sim"))
