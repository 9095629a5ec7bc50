"""Similarity search over an embedding column (list<float>).

- :func:`knn_brute` — exact cosine top-k: the query matrix is broadcast
  once (``ray.put``), each batch does one float64 matmul against it and
  emits only its local top-k per query; the driver reduces the tiny
  partial top-k lists.  O(N·Q·d) compute fully data-parallel, driver
  traffic O(blocks·Q·k).
- :func:`knn_ivf` — the scale path: a deterministic k-means coarse
  quantizer (trained on a bounded sample) assigns each vector to a cell
  ONCE, persisted as a cell-partitioned parquet index
  (:func:`build_ivf_index`); queries probe only their ``nprobe`` nearest
  cells' FILES — the scan is pruned at the read, not post-scan.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.debug import checked_sort
from ..sources.reader import read_parquet_fanout as read_parquet_clean

KNN_BRUTE_SQL_TEMPLATE = """
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings
  WHERE vec_id < {n_queries} AND embedding IS NOT NULL
),
s AS (
  SELECT q.qid, e.vec_id AS nid,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS sim
  FROM embeddings e CROSS JOIN q
  -- null embeddings are non-participants on both sides
  WHERE e.vec_id <> q.qid AND e.embedding IS NOT NULL
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
    # a null-embedding query is a non-participant (both sides of the
    # twins exclude null embeddings)
    tbl = tbl.filter(pc.is_valid(tbl.column("embedding")))
    tbl = tbl.sort_by("vec_id")
    return np.asarray(tbl.column("vec_id")), _normalize(_to_matrix(tbl))


def _partial_topk(batch: pa.Table, q_ref, k: int) -> pa.Table:
    """Local top-k of this batch against the broadcast query matrix.

    cosine = dot of unit vectors, computed in float64 (matches the
    oracle's DOUBLE[] cast).  Self-matches excluded.
    """
    qids, qm = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
    # null vec_id / null embedding rows are non-participants on both
    # sides of the twin (NULL id never passes <>, NULL list has no sim)
    batch = batch.filter(
        pc.and_(pc.is_valid(batch.column("vec_id")), pc.is_valid(batch.column("embedding")))
    )
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

def _sample_ids_partial(batch: pa.Table, sample: int) -> pa.Table:
    """Per-block bottom-``sample`` vec_ids by stable hash (id column only
    leaves the scan — the payload is read in pass 2, pruned to the
    winners).  Null ids are non-participants."""
    from ..functions.hashing import hash_ints_u64

    ids = batch.column("vec_id").combine_chunks().drop_null()
    if len(ids) == 0:
        return pa.table(
            {"vec_id": pa.array([], pa.int64()), "h": pa.array([], pa.uint64())}
        )
    h = hash_ints_u64(ids)
    vid = np.asarray(ids, dtype=np.int64)
    if len(h) > sample:
        keep = np.argpartition(h, sample - 1)[:sample]
        h, vid = h[keep], vid[keep]
    return pa.table({"vec_id": pa.array(vid), "h": pa.array(h, pa.uint64())})


def train_centroids(
    sf_dir: str, *, n_cells: int = 16, sample: int = 4096, iters: int = 8
) -> np.ndarray:
    """Deterministic k-means on a bounded HASH-SPREAD sample (unit sphere).

    The sample is the corpus-wide bottom-``sample`` vec_ids by stable
    multiplicative hash — unbiased even when the corpus is ordered (a
    head sample like ``vec_id < sample`` would train on whatever cluster
    happens to be first), deterministic across block splits and cluster
    sizes, and cheap: pass 1 scans ONLY the id column with per-block
    bottom-k partials; pass 2 reads the payload of just the winners via
    a pushed-down ``isin`` filter."""
    import pyarrow.dataset as pads

    from ..functions.hashing import hash_ints_u64

    src = f"{sf_dir.rstrip('/')}/embeddings.parquet"
    partials_ds = read_parquet_clean(src, columns=["vec_id"]).map_batches(
        _sample_ids_partial, batch_format="pyarrow", fn_kwargs={"sample": sample}
    )
    partials = pa.concat_tables([ray.get(r) for r in partials_ds.to_arrow_refs()])
    h = np.asarray(partials.column("h"))
    vid = np.asarray(partials.column("vec_id"))
    order = np.lexsort((vid, h))[:sample]  # global bottom-k, id tie-break
    chosen = vid[order]
    tbl = pads.dataset(src).to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id").isin(pa.array(chosen, pa.int64())),
    )
    tbl = tbl.filter(pc.is_valid(tbl.column("embedding")))
    # hash order = deterministic pseudo-random order: the first n_cells
    # rows are a spread k-means init, independent of storage order
    rank = {int(v): i for i, v in enumerate(chosen)}
    tbl = tbl.take(
        pa.array(
            np.argsort([rank[int(v)] for v in np.asarray(tbl.column("vec_id"))])
        )
    )
    x = _normalize(_to_matrix(tbl))
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
    # null vectors / ids can never be neighbors — excluded at indexing
    batch = batch.filter(
        pc.and_(pc.is_valid(batch.column("vec_id")), pc.is_valid(batch.column("embedding")))
    )
    emb = _normalize(_to_matrix(batch))
    cell = (emb @ cent.T).argmax(axis=1)
    return batch.append_column("cell", pa.array(cell.astype(np.int32)))


IVF_INDEX_VERSION = 2  # v2: hash-spread training sample


def build_ivf_index(
    sf_dir: str,
    index_dir: str,
    *,
    n_cells: int = 16,
    sample: int = 4096,
    iters: int = 8,
) -> dict:
    """Build (resumably) a PERSISTENT IVF index under ``index_dir``:

    - ``centroids.npy`` — the trained coarse quantizer;
    - ``cells/part=NNNNN/data.parquet`` — the corpus written with the
      cell assignment as the DIRECT partition key (one directory per
      cell, via the resumable partitioned sink), so a query's nprobe
      cells map to a file list and the scan prunes AT THE READ.

    Index construction is the one corpus-wide pass; it is paid once per
    corpus, not per query (round-2 verdict: the per-query reassignment
    read 100% of the embeddings every time).  A crashed build resumes
    from the finished cells' ``_DONE`` markers.
    """
    import json

    from ..sinks import write_partitioned_parquet

    os.makedirs(index_dir, exist_ok=True)
    # Pin the build parameters: resuming an index_dir with different
    # n_cells/sample/iters would silently serve the stale quantizer
    # (same failure class as the sink's _meta.json guard)
    meta_path = os.path.join(index_dir, "index_meta.json")
    params = {"n_cells": n_cells, "sample": sample, "iters": iters}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prior = json.load(f)
        if prior != params:
            raise ValueError(
                f"IVF index parameter mismatch for {index_dir}: built with "
                f"{prior}, now requested {params} — rebuild into a fresh "
                f"index_dir or finish with the original parameters"
            )
    else:
        with open(meta_path, "w") as f:
            json.dump(params, f)
    cent_path = os.path.join(index_dir, "centroids.npy")
    if os.path.exists(cent_path):
        cent = np.load(cent_path)
    else:
        cent = train_centroids(sf_dir, n_cells=n_cells, sample=sample, iters=iters)
        tmp = cent_path + ".tmp"
        with open(tmp, "wb") as f:
            np.save(f, cent)
        os.replace(tmp, cent_path)  # atomic: a crashed build never half-writes
    cent_ref = ray.put(cent)
    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    assigned = ds.map_batches(
        _assign_cells, batch_format="pyarrow", fn_kwargs={"cent_ref": cent_ref}
    )
    return write_partitioned_parquet(
        assigned,
        os.path.join(index_dir, "cells"),
        "cell",
        num_partitions=len(cent),
        sort_key="vec_id",
        assign="direct",
    )


def _ivf_index_dir(sf_dir: str, n_cells: int) -> str:
    """Cached per-corpus index under /tmp, keyed on the embeddings file's
    (path, mtime, size) like the changelog cache — a regenerated corpus
    invalidates the index.  Cheap no-op when already built (the sink's
    all-done fast path + the saved centroids)."""
    import tempfile

    from ..functions.filecache import source_tag

    src = f"{sf_dir.rstrip('/')}/embeddings.parquet"
    tag = source_tag(src, n_cells, f"v{IVF_INDEX_VERSION}")
    d = os.path.join(tempfile.gettempdir(), f"npr_ivf_{tag}")
    build_ivf_index(sf_dir, d, n_cells=n_cells)
    return d


def ivf_probe_paths(
    index_dir: str, qm: np.ndarray, nprobe: int
) -> tuple[np.ndarray, list[str], int]:
    """(probed cells, parquet files to scan, total data files in index).

    The pruning evidence: ``len(paths) / total`` is the fraction of the
    corpus the query batch reads."""
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    probes = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    live = np.unique(probes)
    cells_dir = os.path.join(index_dir, "cells")
    paths = []
    for c in live:
        p = os.path.join(cells_dir, f"part={c:05d}", "data.parquet")
        if os.path.exists(p):  # committed-empty cells have a marker, no file
            paths.append(p)
    total = sum(
        os.path.exists(os.path.join(cells_dir, name, "data.parquet"))
        for name in os.listdir(cells_dir)
        if name.startswith("part=")
    )
    return live, paths, total


def knn_ivf(
    sf_dir: str,
    *,
    k: int = 10,
    n_queries: int = 8,
    n_cells: int = 16,
    nprobe: int = 4,
    index_dir: str | None = None,
) -> pa.Table:
    """Approximate top-k over the PERSISTENT IVF index: only the files of
    the union of the queries' ``nprobe`` nearest cells are read — no
    corpus-wide reassignment, no post-scan filter.  Same output schema
    as :func:`knn_brute`; recall measured against it in tests.
    """
    qids, qm = load_queries(sf_dir, n_queries)
    idx = index_dir or _ivf_index_dir(sf_dir, n_cells)
    _, paths, _ = ivf_probe_paths(idx, qm, nprobe)
    if not paths:
        return _reduce_topk(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            ),
            k,
        )
    q_ref = ray.put((qids, qm))
    ds = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        _partial_topk, batch_format="pyarrow", fn_kwargs={"q_ref": q_ref, "k": k}
    )
    return _reduce_topk(pa.Table.from_pylist(partials.take_all()), k)


# ---------------------------------------------------------------------------
# radius (range) search — all neighbors within a cosine threshold
# ---------------------------------------------------------------------------

KNN_RANGE_TAU = 0.35

KNN_RANGE_SQL_TEMPLATE = """
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings
  WHERE vec_id < {n_queries} AND embedding IS NOT NULL
)
SELECT q.qid AS query_id, e.vec_id AS neighbor_id
FROM embeddings e CROSS JOIN q
WHERE e.vec_id <> q.qid AND e.embedding IS NOT NULL
  AND list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) >= {tau}
ORDER BY query_id, neighbor_id
"""


def _partial_range(batch: pa.Table, q_ref, tau: float) -> pa.Table:
    """Emit every (query, neighbor) pair in this batch with sim >= tau.

    Pure filter semantics — unlike top-k there is no cross-batch reduce
    at all: each batch's qualifying pairs are final, so the op is one
    embarrassingly-parallel map with a tiny output.  Threshold-membership
    determinism vs the SQL twin: the corpus' minimum |sim − tau| margin
    (asserted ≥1e-5 in tests) is ~10 orders above the float64
    summation-order divergence between numpy and DuckDB."""
    qids, qm = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
    # non-participants, like the twin (NULL id / NULL embedding)
    batch = batch.filter(
        pc.and_(pc.is_valid(batch.column("vec_id")), pc.is_valid(batch.column("embedding")))
    )
    ids = np.asarray(batch.column("vec_id"))
    emb = _normalize(_to_matrix(batch))
    sims = emb @ qm.T  # (batch, Q)
    sims[ids[:, None] == qids[None, :]] = -np.inf  # self-matches out
    rows, cols = np.nonzero(sims >= tau)
    return pa.table(
        {
            "query_id": pa.array(qids[cols].astype(np.int64)),
            "neighbor_id": pa.array(ids[rows].astype(np.int64)),
        }
    )


def knn_range(
    sf_dir: str, *, tau: float = KNN_RANGE_TAU, n_queries: int = 8, sort: bool = True
) -> ray.data.Dataset:
    """All neighbors within cosine radius ``tau`` of each query vector —
    the fixed-radius companion to :func:`knn_brute`: broadcast query
    matrix (``ray.put`` once), one matmul + threshold filter per batch,
    no shuffle of the corpus, output is only the qualifying pairs."""
    qids, qm = load_queries(sf_dir, n_queries)
    q_ref = ray.put((qids, qm))
    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = ds.map_batches(
        _partial_range, batch_format="pyarrow", fn_kwargs={"q_ref": q_ref, "tau": tau}
    )
    return out.sort(["query_id", "neighbor_id"]) if sort else out


# ---------------------------------------------------------------------------
# full-corpus k-means (distributed Lloyd's) — clustering as a first-class
# curation op, not just IVF index training
# ---------------------------------------------------------------------------


def _kmeans_partials(batch: pa.Table, cent_ref) -> pa.Table:
    """Per-batch Lloyd's partial: assign each unit-norm vector to its
    max-cosine centroid (argmax → lowest index on ties) and emit ONE row
    per non-empty cluster: (cluster, n, sum-vector, bmin).  ``bmin`` (the
    batch's min vec_id) gives the driver reduce a deterministic fold
    order for a fixed block layout."""
    cent = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
    batch = batch.filter(
        pc.and_(pc.is_valid(batch.column("vec_id")), pc.is_valid(batch.column("embedding")))
    )
    k, d = cent.shape
    empty = pa.table(
        {
            "cluster": pa.array([], pa.int32()),
            "n": pa.array([], pa.int64()),
            "vsum": pa.array([], pa.list_(pa.float64())),
            "bmin": pa.array([], pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    x = _normalize(_to_matrix(batch))
    assign = (x @ cent.T).argmax(axis=1)
    sums = np.zeros((k, d), dtype=np.float64)
    np.add.at(sums, assign, x)
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    live = np.nonzero(counts)[0]
    bmin = int(np.asarray(batch.column("vec_id")).min())
    return pa.table(
        {
            "cluster": pa.array(live.astype(np.int32)),
            "n": pa.array(counts[live]),
            "vsum": pa.array(list(sums[live])),
            "bmin": pa.array(np.full(len(live), bmin, dtype=np.int64)),
        }
    )


def _kmeans_reduce(partials: pa.Table, cent: np.ndarray) -> np.ndarray:
    """Fold the per-batch partials into refreshed unit-norm centroids.

    The fold is sorted by (cluster, bmin) so the float64 summation order
    is deterministic for a fixed block layout; empty clusters keep their
    previous centroid (the standard Lloyd's convention — no respawn, so
    runs are reproducible)."""
    k, d = cent.shape
    p = partials.sort_by([("cluster", "ascending"), ("bmin", "ascending")])
    cl = np.asarray(p.column("cluster"))
    n = np.asarray(p.column("n"))
    vs = np.asarray(p.column("vsum").combine_chunks().flatten(), dtype=np.float64)
    vs = vs.reshape(len(cl), d) if len(cl) else vs.reshape(0, d)
    out = cent.copy()
    for c in range(k):
        m = cl == c
        tot = int(n[m].sum())
        if tot == 0:
            continue
        v = vs[m].sum(axis=0) / tot
        nv = np.linalg.norm(v)
        if nv:
            out[c] = v / nv
    return out


def _kmeans_assign(batch: pa.Table, cent_ref) -> pa.Table:
    cent = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
    batch = batch.filter(
        pc.and_(pc.is_valid(batch.column("vec_id")), pc.is_valid(batch.column("embedding")))
    )
    x = _normalize(_to_matrix(batch))
    assign = (x @ cent.T).argmax(axis=1) if batch.num_rows else np.array([], np.int64)
    return pa.table(
        {
            "vec_id": batch.column("vec_id"),
            "cluster": pa.array(assign.astype(np.int32)),
        }
    )


def kmeans_refine(
    ds: "ray.data.Dataset", init: np.ndarray, iters: int
) -> np.ndarray:
    """Distributed Lloyd's over a (vec_id, embedding) Dataset.

    Scale shape (the whole point): each iteration is ONE streaming pass
    — per-batch K×D float64 partial sums (``map_batches``, vectorized
    matmul + ``np.add.at``), a driver fold of #batches × K rows (tiny),
    and a K×D ``ray.put`` broadcast back.  NO shuffle at any step, so at
    10^10 vectors the cost is iters × scan; the mutable state is O(K×D)
    bytes regardless of corpus size."""
    cent = init.copy()
    for _ in range(max(0, iters)):
        ref = ray.put(cent)
        parts = ds.map_batches(
            _kmeans_partials, batch_format="pyarrow", fn_kwargs={"cent_ref": ref}
        )
        tbl = pa.concat_tables([ray.get(r) for r in parts.to_arrow_refs()])
        cent = _kmeans_reduce(tbl, cent)
    return cent


def kmeans_clusters(
    sf_dir: str,
    *,
    k: int = 8,
    refine_iters: int = 3,
    sample: int = 2048,
    sort: bool = True,
) -> ray.data.Dataset:
    """Full-corpus k-means assignments (vec_id → cluster) on the unit
    sphere: hash-spread sample k-means init (:func:`train_centroids` —
    cheap, deterministic, unbiased under any storage order) + ``refine_
    iters`` distributed Lloyd's passes over ALL vectors, then one assign
    pass.  Output is the per-vector assignment table — the artifact a
    curation pipeline joins against (per-cluster sampling, cluster-level
    dedup, coverage reports).  No SQL twin (iterative); the pytest
    oracle replays the identical algorithm in numpy on planted corpora
    (tests/test_ops_similarity.py)."""
    init = train_centroids(sf_dir, n_cells=k, sample=sample)
    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cent = kmeans_refine(ds, init, refine_iters)
    ref = ray.put(cent)
    out = ds.map_batches(
        _kmeans_assign, batch_format="pyarrow", fn_kwargs={"cent_ref": ref}
    )
    return checked_sort(out, "vec_id") if sort else out
