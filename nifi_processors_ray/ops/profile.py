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
from ..sources.reader import read_parquet_exchange as read_parquet_clean

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


def _corr_sql() -> str:
    from .text import BPE_ISH_PATTERN

    # Every component sum is integer-exact (n_chars and token counts are
    # ints), so both sides derive corr/covar from IDENTICAL int64 sums
    # with the SAME double-op sequence — the value hash cannot drift on
    # float summation order.  CASE guards the zero-variance group with
    # NULL on both sides (DuckDB's float division-by-zero answer is
    # version-dependent; the engine mirrors the guard with a mask).
    n, sx, sy, sxy, sxx, syy = (
        f"CAST({c} AS DOUBLE)" for c in ("n_docs", "sx", "sy", "sxy", "sxx", "syy")
    )
    vx = f"({n} * {sxx} - {sx} * {sx})"
    vy = f"({n} * {syy} - {sy} * {sy})"
    num = f"({n} * {sxy} - {sx} * {sy})"
    return f"""
WITH xy AS (
  SELECT lang,
         CAST(n_chars AS BIGINT) AS x,
         CAST(len(regexp_extract_all(coalesce(text, ''),
              '{BPE_ISH_PATTERN}')) AS BIGINT) AS y
  FROM documents
),
s AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM xy GROUP BY lang
)
SELECT lang, n_docs,
       CASE WHEN {vx} * {vy} <= 0 THEN NULL
            ELSE {num} / (sqrt({vx}) * sqrt({vy}))
       END AS corr_chars_tokens,
       {num} / ({n} * {n}) AS covar_pop
FROM s
ORDER BY lang
"""


DOCS_CORR_SQL = _corr_sql()


def _corr_partials(b: pa.Table) -> pa.Table:
    """Per-batch (lang → component sums) partials for Pearson r between
    doc length (chars) and token count: the classic one-pass sufficient
    statistics (n, Σx, Σy, Σxy, Σx², Σy²) — each batch collapses to
    ≤ distinct-langs rows of int64 sums before anything shuffles."""
    from .text import BPE_ISH_PATTERN

    text = pc.fill_null(b.column("text"), "")
    y = pc.count_substring_regex(text, BPE_ISH_PATTERN).cast(pa.int64())
    x = b.column("n_chars").combine_chunks().cast(pa.int64())
    t = pa.table(
        {
            "lang": b.column("lang"),
            "x": x,
            "y": y,
            "xy": pc.multiply_checked(x, y),
            "xx": pc.multiply_checked(x, x),
            "yy": pc.multiply_checked(y, y),
        }
    )
    g = t.group_by(["lang"]).aggregate(
        [("x", "sum"), ("y", "sum"), ("xy", "sum"), ("xx", "sum"), ("yy", "sum"), ([], "count_all")]
    )
    return pa.table(
        {
            "lang": g.column("lang"),
            "n_docs": g.column("count_all"),
            "sx": g.column("x_sum"),
            "sy": g.column("y_sum"),
            "sxy": g.column("xy_sum"),
            "sxx": g.column("xx_sum"),
            "syy": g.column("yy_sum"),
        }
    )


def _corr_finish(b: pa.Table) -> pa.Table:
    """Closed-form Pearson r / population covariance from the merged
    int64 sums — the exact double-op sequence of the SQL twin."""
    n = np.asarray(b.column("n_docs"), dtype=np.float64)
    sx = np.asarray(b.column("sx"), dtype=np.float64)
    sy = np.asarray(b.column("sy"), dtype=np.float64)
    sxy = np.asarray(b.column("sxy"), dtype=np.float64)
    sxx = np.asarray(b.column("sxx"), dtype=np.float64)
    syy = np.asarray(b.column("syy"), dtype=np.float64)
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    num = n * sxy - sx * sy
    degenerate = vx * vy <= 0
    with np.errstate(divide="ignore", invalid="ignore"):
        corr = num / (np.sqrt(vx) * np.sqrt(vy))
    return pa.table(
        {
            "lang": b.column("lang"),
            "n_docs": b.column("n_docs"),
            "corr_chars_tokens": pa.array(corr, pa.float64(), mask=degenerate),
            "covar_pop": pa.array(num / (n * n), pa.float64()),
        }
    )


def docs_corr(sf_dir: str) -> ray.data.Dataset:
    """Grouped Pearson correlation + population covariance between
    document length (chars) and BPE-ish token count, per language — the
    CORR/COVAR_POP aggregate family done combiner-style: per-batch
    sufficient-statistic partials (int64-exact), ONE tiny groupby of
    ≤ distinct-langs rows, closed-form finish.  Rows never shuffle."""
    from ray.data.aggregate import Sum

    from ..functions.debug import null_safe_groupby_agg, null_safe_sort

    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["lang", "text", "n_chars"]
    )
    partials = ds.map_batches(_corr_partials, batch_format="pyarrow")
    merged = null_safe_groupby_agg(
        partials,
        ["lang"],
        Sum("n_docs", alias_name="n_docs"),
        Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"),
        Sum("sxy", alias_name="sxy"),
        Sum("sxx", alias_name="sxx"),
        Sum("syy", alias_name="syy"),
        out_types={c: pa.int64() for c in ("n_docs", "sx", "sy", "sxy", "sxx", "syy")},
    )
    out = merged.map_batches(_corr_finish, batch_format="pyarrow")
    return null_safe_sort(out, ["lang"])


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
