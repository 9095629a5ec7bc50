"""Persistent inverted text index over the converged lake.

``conversation_search`` scans every turn per query — right for ad-hoc
patterns, wrong as the standing path at 100 TB.  This module is the
text analog of the IVF index (``ops/similarity.build_ivf_index``): pay
ONE corpus pass to write token→(conv_id, n) posting lists hash-bucketed
by token (the resumable partitioned sink), then each term query reads
ONLY its term's buckets — ≤ |terms| of ``num_buckets`` directories,
independent of corpus size.

Token basis is the repo-wide contract (lower + single-space split), so
the DuckDB twin is ``unnest(str_split(lower(text), ' '))`` exactly.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sinks import _assign_partition, _PART_COL, write_partitioned_parquet


def _postings_partial(batch: pa.Table) -> pa.Table:
    """(token, conv_id, n) partials per batch — Arrow split + C++
    hash-count; the index build's only exchange is the sink's bucket
    shuffle of these partials."""
    from ..ops.text import _token_lists

    text = pc.utf8_lower(pc.fill_null(batch.column("text"), ""))
    values, offsets = _token_lists(text)
    conv = batch.column("conv_id").combine_chunks()
    conv_rep = conv.take(
        pa.array(np.repeat(np.arange(len(conv), dtype=np.int64), np.diff(offsets)))
    )
    g = (
        pa.table({"token": values, "conv_id": conv_rep})
        .group_by(["token", "conv_id"])
        .aggregate([([], "count_all")])
    )
    return pa.table(
        {
            "token": g.column("token"),
            "conv_id": g.column("conv_id"),
            "n": g.column("count_all").cast(pa.int64()),
        }
    )


def build_text_index(
    transcripts: ray.data.Dataset, index_dir: str, *, num_buckets: int = 32
) -> dict:
    """Build (resumably) the posting-list index under ``index_dir``.
    A second call over a finished index skips every bucket (the sink's
    ``_DONE`` markers), so callers can treat it as idempotent."""
    ds = transcripts.map_batches(_postings_partial, batch_format="pyarrow")
    return write_partitioned_parquet(
        ds, index_dir, key="token", num_partitions=num_buckets, assign="hash"
    )


def _bucket_of(term: str, num_buckets: int) -> int:
    """The sink's own hash-assign rule, asked directly (never re-derive
    a placement formula — the read side must share the writer's exact
    arithmetic)."""
    t = _assign_partition(
        pa.table({"token": pa.array([term], pa.string())}), "token", num_buckets, "hash"
    )
    return t.column(_PART_COL)[0].as_py()


def search_text_index(index_dir: str, terms: list[str]) -> ray.data.Dataset:
    """Per-conversation hit counts for ``terms``: reads only the ≤
    ``len(terms)`` buckets the terms hash into, with the token filter
    pushed into the parquet scan; the posting aggregation stays
    DISTRIBUTED (a stop-word's posting list is corpus-sized — it must
    never funnel through the driver).  Returns (conv_id, n_hits)."""
    from ray.data.aggregate import Sum

    with open(os.path.join(index_dir, "_meta.json")) as f:
        num_buckets = json.load(f)["num_partitions"]
    want = pa.array(sorted(set(terms)), pa.string())
    buckets = sorted({_bucket_of(t, num_buckets) for t in set(terms)})
    paths = []
    for b in buckets:
        d = os.path.join(index_dir, f"part={b:05d}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
            )
    empty = pa.table(
        {"conv_id": pa.array([], pa.string()), "n_hits": pa.array([], pa.int64())}
    )
    if not paths:
        return ray.data.from_arrow(empty)
    ds = ray.data.read_parquet(paths, filter=pc.field("token").isin(want))

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["conv_id"]).aggregate([("n", "sum")])
        return pa.table({"conv_id": g.column("conv_id"), "n_hits": g.column("n_sum")})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Sum("n_hits", alias_name="n_hits"))
    )
    return out.sort("conv_id")
