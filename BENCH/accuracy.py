"""Accuracy sweeps: measured error vs sketch parameter vs published bound.

Pure-numpy (no Spark) so the numbers are stable and fast; seeded, so
reproducible.  Writes BENCH/ACCURACY.md.

    python BENCH/accuracy.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sketchlib.params import fpp_bound  # noqa: E402
from sketchlib.sketch import BLOOM, CMS, HLL, KLL, KMV, MG, TDIGEST  # noqa: E402


def bloom_sweep():
    rows = []
    n = 200_000
    keys = np.arange(n, dtype=np.int64)
    fresh = np.arange(10_000_000, 10_200_000, dtype=np.int64)
    for p in (0.1, 0.01, 0.001):
        st = BLOOM.create(n, p)
        BLOOM.update(st, keys)
        fn = int((~BLOOM.contains(st, keys)).sum())
        fp = int(BLOOM.contains(st, fresh).sum()) / len(fresh)
        bound = fpp_bound(st.m_bits, st.k, n)
        rows.append((p, st.m_bits / n, st.k, fp, bound, fn))
    md = ["| target p | bits/key | k | measured FPP | bound (1-e^-kn/m)^k | false negs |",
          "|---|---|---|---|---|---|"]
    for p, bpk, k, fp, bound, fn in rows:
        md.append(f"| {p} | {bpk:.2f} | {k} | {fp:.5f} | {bound:.5f} | {fn} |")
    return "\n".join(md)


def hll_sweep():
    md = ["| p | m | cardinality | estimate | rel err | bound 1.04/√m |",
          "|---|---|---|---|---|---|"]
    for p in (10, 12, 14, 16):
        for n in (1_000, 100_000, 2_000_000):
            st = HLL.create(p)
            HLL.update(st, np.arange(n, dtype=np.int64))
            est = HLL.cardinality(st)
            err = abs(est - n) / n
            md.append(f"| {p} | {1 << p} | {n:,} | {est:,.0f} | {err:.4f} "
                      f"| {1.04 / (1 << p) ** 0.5:.4f} |")
    return "\n".join(md)


def cms_sweep():
    rng = np.random.default_rng(7)
    # zipf-ish stream: heavy head + long tail
    stream = np.concatenate([
        np.repeat(np.arange(20, dtype=np.int64), 5_000),
        rng.integers(100, 1_000_000, 400_000).astype(np.int64)])
    md = ["| d | w | eps*N | max overcount (head keys) | undercounts |",
          "|---|---|---|---|---|"]
    for d, w in ((3, 1024), (5, 4096), (7, 16384)):
        st = CMS.create(d, w)
        CMS.update(st, stream)
        head = np.arange(20, dtype=np.int64)
        est = CMS.estimate(st, head)
        over = int((est - 5_000).max())
        under = int((est < 5_000).sum())
        md.append(f"| {d} | {w} | {np.e / w * len(stream):,.0f} | {over:,} | {under} |")
    return "\n".join(md)


def quantile_sweep():
    rng = np.random.default_rng(11)
    data = rng.lognormal(3.0, 1.2, 1_000_000)
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    md = ["| sketch | param | q | est rank err |", "|---|---|---|---|"]
    srt = np.sort(data)
    for k in (100, 200, 400):
        st = KLL.create(k)
        KLL.update(st, data)
        errs = [abs(np.searchsorted(srt, v) / len(data) - q)
                for q, v in zip(qs, KLL.quantile(st, qs))]
        md.append(f"| KLL | k={k} | max over {qs} | {max(errs):.4f} |")
    for delta in (100, 200, 400):
        st = TDIGEST.create(delta)
        TDIGEST.update(st, data)
        errs = [abs(np.searchsorted(srt, v) / len(data) - q)
                for q, v in zip(qs, TDIGEST.quantile(st, qs))]
        tails = [abs(np.searchsorted(srt, v) / len(data) - q)
                 for q, v in zip([0.01, 0.99],
                                 TDIGEST.quantile(st, [0.01, 0.99]))]
        md.append(f"| t-digest | δ={delta} | max (tails {max(tails):.4f}) "
                  f"| {max(errs):.4f} |")
    return "\n".join(md)


def mg_sweep():
    rng = np.random.default_rng(13)
    stream = (rng.zipf(1.3, 1_000_000) % 50_000).astype(np.int64)
    import collections

    true = collections.Counter(stream.tolist())
    n = len(stream)
    md = ["| cap | decr_total (exact err) | published bound n/(cap+1) | "
          "heavy keys (f>bound) missed |", "|---|---|---|---|"]
    for cap in (64, 256, 1024):
        st = MG.create(cap)
        for s in range(0, n, 65_536):
            MG.update(st, stream[s:s + 65_536])
        stored = set(st.keys)
        missed = sum(1 for k, f in true.items()
                     if f > st.decr_total and k not in stored)
        md.append(f"| {cap} | {st.decr_total:,} | {n / (cap + 1):,.0f} "
                  f"| {missed} |")
    return "\n".join(md)


def kmv_sweep():
    md = ["| k | true distinct | estimate | rel err | bound 1/√(k-2) |",
          "|---|---|---|---|---|"]
    for k in (256, 1024, 4096):
        for n in (10_000, 1_000_000):
            st = KMV.update(KMV.create(k), np.arange(n, dtype=np.int64))
            est = KMV.distinct_count(st)
            md.append(f"| {k} | {n:,} | {est:,.0f} | {abs(est - n) / n:.4f} "
                      f"| {1 / (k - 2) ** 0.5:.4f} |")
    return "\n".join(md)


def main() -> None:
    out = f"""# ACCURACY — measured error vs published bounds (seeded, numpy-only)

## Bloom (n=200k inserts, 200k fresh probes)

{bloom_sweep()}

## HyperLogLog

{hll_sweep()}

## Count-min (500k-item stream, 20 heavy keys @5k each)

{cms_sweep()}

## Quantiles (1M lognormal samples)

{quantile_sweep()}

## Misra-Gries (1M-item Zipf stream, 50k key space)

{mg_sweep()}

## KMV distinct-count

{kmv_sweep()}
"""
    with open(os.path.join(REPO, "BENCH", "ACCURACY.md"), "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
