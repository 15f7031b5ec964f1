"""Data-quality profiling over arbitrary tables.

One operator: ``profile_table`` -- per-column row / null / exact
distinct counts, the schema-on-read health check a pipeline runs
before trusting a new 100 TB drop.  Output is one row per COLUMN, so
the driver-side assembly is bounded by schema width, never data size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def profile_table(ds, columns: list[str] | None = None, n_buckets: int = 64):
    """Per-column profile: ``(col_name, n_rows, n_nulls, n_distinct)``
    as a small pandas DataFrame (one row per column -- the ONLY
    driver-side materialization, bounded by schema width).

    ``n_distinct`` is exact and excludes nulls (SQL ``count(DISTINCT
    col)`` semantics).  Values of every type are compared through
    their Arrow string cast, which is injective per column (Arrow
    renders floats with shortest-round-trip digits); ``-0.0`` vs
    ``0.0`` is the one documented divergence from SQL numeric
    equality.

    Scale shape: the counts pass ships one partial row per column per
    block.  The distinct pass melts each block to per-column DISTINCT
    (col, value) pairs FIRST (an in-task Arrow group_by -- repeated
    values never leave the block), then buckets by a value hash alone,
    so every occurrence of a value lands in one bucket and the
    per-bucket second dedup is globally exact; the final groupby sums
    ``n_buckets x n_cols`` tiny partials.  Nothing driver-side ever
    sees a value.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    from .events import _string_bucket

    cols = list(columns) if columns else list(ds.schema().names)

    def count_partials(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "col_name": pa.array(cols, pa.string()),
                "n_part": pa.array(
                    [b.num_rows] * len(cols), pa.int64()
                ),
                "null_part": pa.array(
                    [b.column(c).null_count for c in cols], pa.int64()
                ),
            }
        )

    def melt_distinct(b: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in cols:
            v = pc.cast(b.column(c).combine_chunks(), pa.string())
            v = v.drop_null().unique()
            names.append(
                pa.array(np.full(len(v), c, dtype=object), pa.string())
            )
            vals.append(v)
        name_col = pa.concat_arrays(names)
        val_col = pa.concat_arrays(vals)
        return pa.table(
            {
                "vb": _string_bucket(val_col, n_buckets),
                "col_name": name_col,
                "v": val_col,
            }
        )

    def distinct_in_bucket(tbl: pa.Table) -> pa.Table:
        d = tbl.group_by(["col_name", "v"]).aggregate([])
        part = d.group_by("col_name").aggregate([("v", "count")])
        return pa.table(
            {
                "col_name": part.column("col_name"),
                "d_part": part.column("v_count").cast(pa.int64()),
            }
        )

    counts = (
        ds.map_batches(count_partials, batch_format="pyarrow")
        .groupby("col_name")
        .aggregate(Sum("n_part"), Sum("null_part"))
        .to_pandas()
        .rename(
            columns={
                "sum(n_part)": "n_rows",
                "sum(null_part)": "n_nulls",
            }
        )
    )
    distinct = (
        ds.map_batches(melt_distinct, batch_format="pyarrow")
        .groupby("vb")
        .map_groups(distinct_in_bucket, batch_format="pyarrow")
        .groupby("col_name")
        .aggregate(Sum("d_part"))
        .to_pandas()
        .rename(columns={"sum(d_part)": "n_distinct"})
    )
    out = counts.merge(distinct, on="col_name", how="left")
    out["n_distinct"] = (
        out["n_distinct"].fillna(0).astype("int64")
    )  # an all-null column never reaches the distinct pass
    return out.sort_values("col_name").reset_index(drop=True)
