"""Table profiling: per-column summary statistics.

The data-quality primitive every ingest engine ships (the reference
surfaces per-flow provenance attributes instead —
``consumer/AbstractKinesisConsumerProcessor.java`` emits record counts
via CloudWatch; a dataset engine profiles the data itself): for each
profiled column, null count, exact distinct count, and min/max.

Shape per column: ONE tiny all-reduce for (rows, nulls, min, max) — a
single partial row per batch — plus ONE shuffle for the exact distinct
count, whose exchange carries only per-batch-unique values (the
combiner collapses repeats before anything moves).  At 100 TB swap the
distinct stage for the HLL sketch in :mod:`..functions.sketches`; the
exact form here is what the SQL oracle can check.

Integers render through ``str(int)`` which matches DuckDB's
``CAST(BIGINT AS VARCHAR)`` digit-for-digit; floats are profiled as
floored cents (the engine-wide integer-exactness invariant) so no
float-formatting divergence can reach the value hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.money import floored_cents
from ..sources.reader import read_parquet as read_parquet_clean

TABLE_PROFILE_SQL = """
SELECT * FROM (
  SELECT 'event_type' AS col,
         CAST(COUNT(*) - COUNT(event_type) AS BIGINT) AS n_nulls,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_distinct,
         CAST(MIN(event_type) AS VARCHAR) AS min_val,
         CAST(MAX(event_type) AS VARCHAR) AS max_val
  FROM events
  UNION ALL
  SELECT 'user_id',
         CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
         CAST(COUNT(DISTINCT user_id) AS BIGINT),
         CAST(MIN(user_id) AS VARCHAR),
         CAST(MAX(user_id) AS VARCHAR)
  FROM events
  UNION ALL
  SELECT 'value_cents',
         CAST(COUNT(*) - COUNT(value) AS BIGINT),
         CAST(COUNT(DISTINCT CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT),
         CAST(MIN(CAST(FLOOR(value * 100) AS BIGINT)) AS VARCHAR),
         CAST(MAX(CAST(FLOOR(value * 100) AS BIGINT)) AS VARCHAR)
  FROM events
)
ORDER BY col
"""

# (profile row name, physical column to read, projection)
_SPECS: list[tuple[str, str]] = [
    ("event_type", "event_type"),
    ("user_id", "user_id"),
    ("value_cents", "value"),
]


def _project(name: str, col: pa.ChunkedArray) -> pa.ChunkedArray | pa.Array:
    if name == "value_cents":
        return floored_cents(col)
    return col


def _col_stats(ds: ray.data.Dataset, name: str, src: str) -> dict:
    """(n_nulls, min, max) via one partial row per batch + driver reduce."""

    def partial(b: pa.Table) -> pa.Table:
        v = _project(name, b.column(src))
        valid = pc.drop_null(v)
        has = len(valid) > 0
        return pa.table(
            {
                "n_nulls": pa.array([b.num_rows - len(valid)], pa.int64()),
                "min_val": pa.array([pc.min(valid).as_py() if has else None], valid.type),
                "max_val": pa.array([pc.max(valid).as_py() if has else None], valid.type),
            }
        )

    from ray.data.aggregate import Max, Min, Sum

    row = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n_nulls", alias_name="n_nulls"),
        Min("min_val", alias_name="min_val"),
        Max("max_val", alias_name="max_val"),
    )
    return row


def _col_distinct(ds: ray.data.Dataset, name: str, src: str) -> int:
    """Exact distinct count: per-batch unique combiner, one shuffle,
    then a distributed row count — values never collect on the driver."""

    def uniq(b: pa.Table) -> pa.Table:
        v = _project(name, b.column(src))
        return pa.table({"val": pc.unique(pc.drop_null(v))})

    return ds.map_batches(uniq, batch_format="pyarrow").groupby("val").count().count()


def table_profile(sf_dir: str) -> pa.Table:
    """Per-column profile of the events table — null count, exact
    distinct count, min and max, one row per profiled column (output is
    metadata-sized: one row per column, whatever the input size)."""
    rows = []
    for name, src in _SPECS:
        ds = read_parquet_clean(f"{sf_dir.rstrip('/')}/events.parquet", columns=[src])
        st = _col_stats(ds, name, src)
        nd = _col_distinct(ds, name, src)
        rows.append(
            {
                "col": name,
                "n_nulls": int(st["n_nulls"] or 0),
                "n_distinct": int(nd),
                "min_val": str(st["min_val"]),
                "max_val": str(st["max_val"]),
            }
        )
    rows.sort(key=lambda r: r["col"])
    return pa.table(
        {
            "col": pa.array([r["col"] for r in rows]),
            "n_nulls": pa.array([r["n_nulls"] for r in rows], pa.int64()),
            "n_distinct": pa.array([r["n_distinct"] for r in rows], pa.int64()),
            "min_val": pa.array([r["min_val"] for r in rows]),
            "max_val": pa.array([r["max_val"] for r in rows]),
        }
    )
