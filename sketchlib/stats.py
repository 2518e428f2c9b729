"""Table statistics from metadata — sizing inputs without data scans.

Bloom sizing (params.BloomParams) needs the expected key count n.  Round 1
derived it with a full ``df.count()`` pre-pass, which at 100 TB doubles the
scan cost of every bloom build.  Parquet footers (and, at real scale, the
Iceberg snapshot's ``total-records`` summary — io_iceberg.py) already know
the row count; reading them is a driver-side metadata operation, no Spark
job, no data pages touched.

Row count is an upper bound on non-null key count, which is the safe
direction for sizing: the filter is at most a few percent larger than
needed, the FPP bound (computed from the ACTUAL n_inserted at query time)
only tightens.
"""

from __future__ import annotations

import os

__all__ = ["parquet_row_count", "table_row_count"]


def parquet_row_count(path: str) -> int:
    """Exact row count of a parquet file/directory from footer metadata
    only.  Cost: one footer read per fragment — O(files), not O(rows)."""
    import pyarrow.dataset as ds

    dataset = ds.dataset(path, format="parquet")
    return sum(frag.metadata.num_rows for frag in dataset.get_fragments())


def table_row_count(sf_dir: str, name: str) -> int:
    """Row count of a test-data table (``{sf_dir}/{name}.parquet``)."""
    return parquet_row_count(os.path.join(sf_dir, f"{name}.parquet"))
