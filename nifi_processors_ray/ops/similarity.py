"""Similarity search over an embedding column (list<float>).

- :func:`knn_brute` — exact cosine top-k: the query matrix is broadcast
  once (``ray.put``), each batch does one float64 matmul against it and
  emits only its local top-k per query; the driver reduces the tiny
  partial top-k lists.  O(N·Q·d) compute fully data-parallel, driver
  traffic O(blocks·Q·k).
- :func:`knn_ivf` — the scale path: a deterministic k-means coarse
  quantizer (trained on a bounded sample) assigns each vector to a cell;
  queries probe only their ``nprobe`` nearest cells, pruning the scan
  at the READ via a partition filter on the assigned cell.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..sources.reader import read_parquet as read_parquet_clean

KNN_BRUTE_SQL_TEMPLATE = """
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {n_queries}
),
s AS (
  SELECT q.qid, e.vec_id AS nid,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.qid
),
r AS (
  SELECT qid, nid, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
  FROM s
)
SELECT qid AS query_id, nid AS neighbor_id, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
ORDER BY query_id, rank
"""


def _to_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    n = batch.num_rows
    return np.asarray(
        batch.column(col).combine_chunks().flatten(), dtype=np.float64
    ).reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """(query ids, UNIT-NORM query matrix) — first ``n_queries`` by id.

    Normalized once here, before the broadcast — not per batch in the
    hot path."""
    import pyarrow.dataset as pads

    tbl = pads.dataset(f"{sf_dir.rstrip('/')}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < n_queries
    )
    tbl = tbl.sort_by("vec_id")
    return np.asarray(tbl.column("vec_id")), _normalize(_to_matrix(tbl))


def _partial_topk(batch: pa.Table, q_ref, k: int) -> pa.Table:
    """Local top-k of this batch against the broadcast query matrix.

    cosine = dot of unit vectors, computed in float64 (matches the
    oracle's DOUBLE[] cast).  Self-matches excluded.
    """
    qids, qm = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
    ids = np.asarray(batch.column("vec_id"))
    emb = _normalize(_to_matrix(batch))
    sims = emb @ qm.T  # (batch, Q); qm ships unit-norm from load_queries
    self_rows = np.isin(ids, qids)
    if self_rows.any():
        sub = sims[self_rows]
        sub[ids[self_rows, None] == qids[None, :]] = -np.inf
        sims[self_rows] = sub
    kk = min(k, len(ids))
    top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
    out_q, out_n, out_s = [], [], []
    for qi in range(len(qids)):
        rows = top[:, qi]
        out_q.append(np.full(kk, qids[qi]))
        out_n.append(ids[rows])
        out_s.append(sims[rows, qi])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q).astype(np.int64)),
            "neighbor_id": pa.array(np.concatenate(out_n).astype(np.int64)),
            "sim": pa.array(np.concatenate(out_s)),
        }
    )


def _reduce_topk(partials: pa.Table, k: int) -> pa.Table:
    """Driver-side merge of per-block top-k partials (tiny input)."""
    q = np.asarray(partials.column("query_id"))
    n = np.asarray(partials.column("neighbor_id"))
    s = np.asarray(partials.column("sim"))
    out_q, out_n, out_r = [], [], []
    for qid in np.unique(q):
        m = q == qid
        # rank by (-sim, neighbor_id): deterministic under ties like the SQL
        order = np.lexsort((n[m], -s[m]))[:k]
        out_q.append(np.full(len(order), qid))
        out_n.append(n[m][order])
        out_r.append(np.arange(1, len(order) + 1))
    if not out_q:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q).astype(np.int64)),
            "neighbor_id": pa.array(np.concatenate(out_n).astype(np.int64)),
            "rank": pa.array(np.concatenate(out_r).astype(np.int64)),
        }
    )


def knn_brute(sf_dir: str, *, k: int = 10, n_queries: int = 8) -> pa.Table:
    """Exact cosine top-k for the first ``n_queries`` vectors."""
    qids, qm = load_queries(sf_dir, n_queries)
    q_ref = ray.put((qids, qm))
    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    partials = ds.map_batches(
        _partial_topk, batch_format="pyarrow", fn_kwargs={"q_ref": q_ref, "k": k}
    )
    return _reduce_topk(pa.Table.from_pylist(partials.take_all()), k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate variant — the scale path
# ---------------------------------------------------------------------------

def train_centroids(
    sf_dir: str, *, n_cells: int = 16, sample: int = 4096, iters: int = 8
) -> np.ndarray:
    """Deterministic k-means on a bounded head sample (unit sphere)."""
    import pyarrow.dataset as pads

    tbl = pads.dataset(f"{sf_dir.rstrip('/')}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < sample
    )
    x = _normalize(_to_matrix(tbl.sort_by("vec_id")))
    n_cells = min(n_cells, len(x))
    cent = x[:n_cells].copy()  # deterministic init: first vectors
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(n_cells):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                nv = np.linalg.norm(v)
                cent[c] = v / nv if nv else cent[c]
    return cent


def _assign_cells(batch: pa.Table, cent_ref) -> pa.Table:
    cent = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
    emb = _normalize(_to_matrix(batch))
    cell = (emb @ cent.T).argmax(axis=1)
    return batch.append_column("cell", pa.array(cell.astype(np.int32)))


def knn_ivf(
    sf_dir: str,
    *,
    k: int = 10,
    n_queries: int = 8,
    n_cells: int = 16,
    nprobe: int = 4,
) -> pa.Table:
    """Approximate top-k: scan only the ``nprobe`` cells nearest each query.

    Same output schema as :func:`knn_brute`; recall measured against it
    in tests.  At scale the assignment is written as the lake partition
    key so the probe prunes at the read instead of filtering post-scan.
    """
    qids, qm = load_queries(sf_dir, n_queries)
    cent = train_centroids(sf_dir, n_cells=n_cells)
    probes = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    live_cells = np.unique(probes)
    cent_ref = ray.put(cent)
    q_ref = ray.put((qids, qm))

    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ds = ds.map_batches(_assign_cells, batch_format="pyarrow", fn_kwargs={"cent_ref": cent_ref})
    import pyarrow.compute as pc

    live = pa.array(live_cells.astype(np.int32))
    ds = ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column("cell"), value_set=live)),
        batch_format="pyarrow",
    )
    partials = ds.map_batches(
        _partial_topk, batch_format="pyarrow", fn_kwargs={"q_ref": q_ref, "k": k}
    )
    return _reduce_topk(pa.Table.from_pylist(partials.take_all()), k)
