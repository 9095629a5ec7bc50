"""Table profiling: per-column summary statistics.

The data-quality primitive every ingest engine ships (the reference
surfaces per-flow provenance attributes instead —
``consumer/AbstractKinesisConsumerProcessor.java`` emits record counts
via CloudWatch; a dataset engine profiles the data itself): for each
profiled column, null count, exact distinct count, and min/max.

Shape: TWO dataset executions total, whatever the column count —
one scan emits a single all-columns stats row per batch (nulls, min,
max — a tiny all-reduce), and one scan feeds a single shared distinct
exchange of per-batch-unique ``(col, val)`` pairs (the combiner
collapses repeats before anything moves; values ride as strings, an
injective encoding per column, so one exchange serves every dtype).
At 100 TB swap the distinct stage for the HLL sketch in
:mod:`..functions.sketches`; the exact form here is what the SQL
oracle can check.

Integers render through Arrow's int64→utf8 cast which matches DuckDB's
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

# (profile row name, physical column to read)
_SPECS: list[tuple[str, str]] = [
    ("event_type", "event_type"),
    ("user_id", "user_id"),
    ("value_cents", "value"),
]
_READ_COLS = sorted({src for _, src in _SPECS})


def _project(name: str, col: pa.ChunkedArray) -> pa.ChunkedArray | pa.Array:
    if name == "value_cents":
        return floored_cents(col)
    return col


def _stats_partial(b: pa.Table) -> pa.Table:
    """One row per batch carrying (nulls, min, max) for EVERY profiled
    column — the whole stats phase is a single scan + tiny all-reduce."""
    cols: dict[str, pa.Array] = {}
    for name, src in _SPECS:
        v = _project(name, b.column(src))
        valid = pc.drop_null(v)
        has = len(valid) > 0
        cols[f"{name}__nulls"] = pa.array([b.num_rows - len(valid)], pa.int64())
        cols[f"{name}__min"] = pa.array([pc.min(valid).as_py() if has else None], v.type)
        cols[f"{name}__max"] = pa.array([pc.max(valid).as_py() if has else None], v.type)
    return pa.table(cols)


def _distinct_partial(b: pa.Table) -> pa.Table:
    """Per-batch-unique (col, val) pairs for every profiled column —
    one shared exchange downstream counts exact distincts for all
    columns at once.  Values ride as strings: Arrow's int64→utf8 cast
    is injective, so distinctness is preserved per column."""
    parts = []
    for name, src in _SPECS:
        vals = pc.unique(pc.drop_null(_project(name, b.column(src))))
        parts.append(
            pa.table(
                {
                    # explicit string type: [] would infer null type and
                    # fail schema unification in the shared exchange
                    "col": pa.array([name] * len(vals), pa.string()),
                    "val": pc.cast(vals, pa.string()),
                }
            )
        )
    return pa.concat_tables(parts)


def table_profile(sf_dir: str) -> pa.Table:
    """Per-column profile of the events table — null count, exact
    distinct count, min and max, one row per profiled column (output is
    metadata-sized: one row per column, whatever the input size)."""
    from ray.data.aggregate import Max, Min, Sum

    path = f"{sf_dir.rstrip('/')}/events.parquet"

    aggs = []
    for name, _ in _SPECS:
        aggs += [
            Sum(f"{name}__nulls", alias_name=f"{name}__nulls"),
            Min(f"{name}__min", alias_name=f"{name}__min"),
            Max(f"{name}__max", alias_name=f"{name}__max"),
        ]
    stats = (
        read_parquet_clean(path, columns=_READ_COLS)
        .map_batches(_stats_partial, batch_format="pyarrow")
        .aggregate(*aggs)
    )

    # exact distincts: per-batch unique combiner → one shared shuffle on
    # (col, val) → a per-col row count of the distinct pairs
    pair_counts = (
        read_parquet_clean(path, columns=_READ_COLS)
        .map_batches(_distinct_partial, batch_format="pyarrow")
        .groupby(["col", "val"])
        .count()
        .groupby("col")
        .count()
        .take_all()
    )
    distinct_by_col = {r["col"]: int(r["count()"]) for r in pair_counts}

    rows = []
    for name, _ in _SPECS:
        rows.append(
            {
                "col": name,
                "n_nulls": int(stats[f"{name}__nulls"] or 0),
                "n_distinct": distinct_by_col.get(name, 0),
                # NULL min/max (all-null column) stays NULL, like the twin
                "min_val": None if (mn := stats[f"{name}__min"]) is None else str(mn),
                "max_val": None if (mx := stats[f"{name}__max"]) is None else str(mx),
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
