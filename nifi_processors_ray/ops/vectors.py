"""Vector-column aggregation: per-label embedding sums/centroids.

The grouped-vector-reduce primitive (class centroids, per-source mean
embeddings, …) done combiner-style: each batch reduces its rows to one
(labels × dim) partial matrix — a few KB — so the shuffle moves
per-batch partials, never embedding rows.

Determinism contract with the SQL oracle: components are quantized to
micro-units (``floor(x * 1e6)`` — identical in IEEE double both sides)
and summed as int64, so the value-hash cannot drift on float summation
order.  Callers wanting the float centroid divide ``comp_sum / (1e6 *
n_vecs)`` downstream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..sources.reader import read_parquet_fanout as read_parquet_clean

QUANT = 1_000_000

LABEL_VECTOR_SUMS_SQL = f"""
SELECT CAST(label AS BIGINT) AS label, ord AS dim,
       -- DOUBLE cast BEFORE the multiply: the parquet column is float32
       -- and a float32 multiply floors differently than the engine's
       -- float64 path near integer boundaries.  Outer BIGINT cast on the
       -- SUM: DuckDB SUM(BIGINT) → HUGEINT → pandas float64, which
       -- hash-mismatches the engine's int64 (VERDICT r1 #1); same for
       -- label, which parquet round-trips as int32 vs the engine's int64.
       CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS BIGINT) AS comp_sum,
       COUNT(*) AS n_vecs
FROM (
  SELECT label, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS ord
  FROM embeddings
)
GROUP BY label, ord
ORDER BY label, dim
"""


def _label_partials(batch: pa.Table) -> pa.Table:
    """One (labels × dim) partial matrix per batch — fully vectorized:
    labels are code-compressed once and ``np.add.at`` scatter-adds every
    row into its label's accumulator (no per-label Python loop)."""
    import pyarrow.compute as pc

    # a NULL embedding unnests to zero rows in the twin — invisible
    batch = batch.filter(pc.is_valid(batch.column("embedding")))
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "label": pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "comp_sum": pa.array([], pa.int64()),
                "n_vecs": pa.array([], pa.int64()),
            }
        )
    emb = np.asarray(
        batch.column("embedding").combine_chunks().flatten(), dtype=np.float64
    ).reshape(n, -1)
    q = np.floor(emb * QUANT).astype(np.int64)
    # dictionary codes, NOT np.unique: a null label would surface as NaN
    # (every row its own group) where SQL GROUP BY keeps ONE null group
    enc = batch.column("label").combine_chunks().dictionary_encode()
    codes = np.asarray(pc.fill_null(enc.indices, len(enc.dictionary))).astype(np.int64)
    n_groups = len(enc.dictionary) + 1  # last slot = the NULL label
    dim = q.shape[1]
    sums = np.zeros((n_groups, dim), dtype=np.int64)
    np.add.at(sums, codes, q)
    counts = np.bincount(codes, minlength=n_groups).astype(np.int64)
    present = np.nonzero(counts > 0)[0]
    label_domain = pa.concat_arrays(
        [enc.dictionary.cast(pa.int64()), pa.array([None], pa.int64())]
    )
    return pa.table(
        {
            "label": label_domain.take(
                pa.array(np.repeat(present, dim).astype(np.int64))
            ),
            # 1-based like generate_subscripts
            "dim": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64), len(present))),
            "comp_sum": pa.array(sums[present].reshape(-1)),
            "n_vecs": pa.array(np.repeat(counts[present], dim)),
        }
    )


def label_vector_sums(sf_dir: str) -> ray.data.Dataset:
    """Quantized per-label component sums (the centroid numerator)."""
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/embeddings.parquet", columns=["label", "embedding"]
    )
    from ..functions.debug import null_safe_groupby_agg, null_safe_sort

    partials = ds.map_batches(_label_partials, batch_format="pyarrow")
    # null-safe: a NULL label is one SQL GROUP BY group (and Ray's raw
    # sort-based groupby TypeErrors when a None hits its boundary
    # sample); also rides the vectorized integer fast path
    agg = null_safe_groupby_agg(
        partials,
        ["label", "dim"],
        Sum("comp_sum", alias_name="comp_sum"),
        Sum("n_vecs", alias_name="n_vecs"),
        out_types={"comp_sum": pa.int64(), "n_vecs": pa.int64()},
    )
    return null_safe_sort(agg, ["label", "dim"])


LABEL_CENTROIDS_SQL = f"""
WITH s AS (
  SELECT CAST(label AS BIGINT) AS label, ord AS dim,
         CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS BIGINT) AS comp_sum,
         COUNT(*) AS n_vecs
  FROM (
    SELECT label, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS ord
    FROM embeddings
  )
  GROUP BY label, ord
)
SELECT label, dim, n_vecs,
       CAST(comp_sum AS DOUBLE) / ({QUANT} * CAST(n_vecs AS DOUBLE)) AS centroid
FROM s
ORDER BY label, dim
"""


def label_centroid_rows(sf_dir: str) -> ray.data.Dataset:
    """Per-label mean embedding as flat (label, dim, centroid) rows —
    the float finish over the exact quantized sums, so the division is
    the only float op and is bit-identical to the SQL twin's.  The
    grouped-vector-mean primitive (class centroids for IVF seeding,
    per-source embedding drift)."""

    def finish(b: pa.Table) -> pa.Table:
        comp = np.asarray(b.column("comp_sum"), dtype=np.float64)
        n = np.asarray(b.column("n_vecs"), dtype=np.float64)
        return pa.table(
            {
                "label": b.column("label"),
                "dim": b.column("dim"),
                "n_vecs": b.column("n_vecs"),
                "centroid": pa.array(comp / (QUANT * n), pa.float64()),
            }
        )

    return label_vector_sums(sf_dir).map_batches(finish, batch_format="pyarrow")


def label_centroids(sf_dir: str) -> pa.Table:
    """Float centroids per label (driver-side finish over the tiny sums)."""
    sums = pa.Table.from_pylist(label_vector_sums(sf_dir).take_all())
    labels = np.asarray(sums.column("label"))
    dims = np.asarray(sums.column("dim"))
    comp = np.asarray(sums.column("comp_sum"), dtype=np.float64)
    n = np.asarray(sums.column("n_vecs"), dtype=np.float64)
    centroid = comp / (QUANT * n)
    uniq = np.unique(labels)
    dim = int(dims.max())
    mats = np.zeros((len(uniq), dim))
    for i, lab in enumerate(uniq):
        m = labels == lab
        mats[i, dims[m] - 1] = centroid[m]
    return pa.table(
        {
            "label": pa.array(uniq.astype(np.int64)),
            "centroid": pa.FixedSizeListArray.from_arrays(pa.array(mats.reshape(-1)), dim),
        }
    )
