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

__all__ = ["parquet_row_count", "table_row_count",
           "parquet_column_sum_upper", "table_column_sum_upper"]


def parquet_row_count(path: str) -> int:
    """Exact row count of a parquet file/directory from footer metadata
    only.  Cost: one footer read per fragment — O(files), not O(rows)."""
    import pyarrow.dataset as ds

    dataset = ds.dataset(path, format="parquet")
    return sum(frag.metadata.num_rows for frag in dataset.get_fragments())


def table_row_count(sf_dir: str, name: str) -> int:
    """Row count of a test-data table (``{sf_dir}/{name}.parquet``)."""
    return parquet_row_count(os.path.join(sf_dir, f"{name}.parquet"))


def parquet_column_sum_upper(path: str, column: str) -> int:
    """Upper bound on SUM(column) from footer metadata only:
    Σ over row groups of num_rows × max(column).  No data pages touched —
    the sizing analogue of parquet_row_count for per-row quantities (e.g.
    bounding total shingles by Σ n_chars).  Loose by max/mean of the
    column's distribution; at real scale an Iceberg snapshot's column-stat
    sums (or a prior crawl's sketch) tighten it — this is the zero-cost
    fallback that needs nothing but the footer."""
    import pyarrow.dataset as ds

    dataset = ds.dataset(path, format="parquet")
    if column not in dataset.schema.names:
        raise KeyError(f"column {column!r} not in parquet schema")
    total = 0
    for frag in dataset.get_fragments():
        md = frag.metadata
        if md.num_row_groups == 0:  # empty part file: contributes nothing
            continue
        names = {md.row_group(0).column(i).path_in_schema: i
                 for i in range(md.row_group(0).num_columns)}
        ci = names[column]
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            st = rg.column(ci).statistics
            if st is None or not st.has_min_max:
                raise ValueError(f"no min/max stats for {column!r}")
            total += rg.num_rows * int(st.max)
    return total


def table_column_sum_upper(sf_dir: str, name: str, column: str) -> int:
    return parquet_column_sum_upper(
        os.path.join(sf_dir, f"{name}.parquet"), column)
