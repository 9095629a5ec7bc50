"""Resumable hash-partitioned Parquet sink.

The engine's lake writes are already partitioned and resumable (2PC
manifest); this is the GENERIC export sink for analysis outputs — the
"write partitioned Parquet so a failed run can skip finished
partitions; never one giant file" rule as a reusable stage:

- output layout: ``out_dir/part=NNNNN/data.parquet`` + a ``_DONE``
  marker written AFTER the data file (write-then-rename is not needed:
  the marker is the commit point, and a partition without a marker is
  re-written from scratch on resume);
- partition assignment is a pure function of the key (same
  ``hash_strings_u64``/``hash_ints_u64`` family as the lake), so a
  resumed run reproduces identical partition contents;
- finished partitions are detected on the DRIVER before the run and
  filtered OUT of the Dataset, so a resume does not even read the
  already-exported key ranges' shuffled blocks — work skipped, not
  redone.

Reference lineage: the producer's per-batch success routing + retry
(``producer/PutKinesisStream.java:287-334``) — a failed export re-run
must neither duplicate nor lose records.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from .functions.hashing import hash_ints_u64, hash_strings_u64

_PART_COL = "__export_part"


def _assign_partition(
    batch: pa.Table, key: str, num_partitions: int, assign: str = "hash"
) -> pa.Table:
    col = batch.column(key)
    if assign == "direct":
        # the key column IS the partition index (e.g. an IVF cell id) —
        # one output directory per key value, prunable at the read
        part_arr = col.cast(pa.int32()).combine_chunks()
        import pyarrow.compute as pc

        mn, mx = pc.min(part_arr).as_py(), pc.max(part_arr).as_py()
        if mn is not None and (mn < 0 or mx >= num_partitions):
            raise ValueError(
                f"direct partition key {key} out of range [0, {num_partitions}): "
                f"saw [{mn}, {mx}]"
            )
        return batch.append_column(_PART_COL, part_arr)
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        h = hash_strings_u64(col)
    else:
        # hash_ints_u64 fills nulls arrow-side (int64-preserving) so the
        # partition stays a pure function of the key even with nulls in
        # the batch and keys ≥ 2^53 — the resume contract depends on it
        h = hash_ints_u64(col.cast(pa.int64()).combine_chunks())
    part = (h % np.uint64(num_partitions)).astype(np.int32)
    return batch.append_column(_PART_COL, pa.array(part))


def _partition_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part:05d}")


def _write_group(group: pa.Table, out_dir: str, sort_key) -> pa.Table:
    part = int(group.column(_PART_COL)[0].as_py())
    group = group.drop_columns([_PART_COL])
    if sort_key:
        if isinstance(sort_key, str):
            sort_key = [sort_key]
        group = group.sort_by([(k, "ascending") for k in sort_key])
    d = _partition_dir(out_dir, part)
    os.makedirs(d, exist_ok=True)
    pq.write_table(group, os.path.join(d, "data.parquet"))
    with open(os.path.join(d, "_DONE"), "w") as f:
        f.write(str(group.num_rows))
    return pa.table(
        {"partition": pa.array([part], pa.int32()), "rows": pa.array([group.num_rows], pa.int64())}
    )


def write_partitioned_parquet(
    ds: ray.data.Dataset,
    out_dir: str,
    key: str,
    *,
    num_partitions: int = 64,
    sort_key: "str | list[str] | None" = None,
    assign: str = "hash",
) -> dict:
    """Export ``ds`` as partitioned Parquet, resumably.

    ``assign="hash"`` (default) hash-partitions the key into
    ``num_partitions`` buckets; ``assign="direct"`` uses the integer key
    VALUE as the partition index (one directory per key value — the
    layout a read-side partition filter can prune, e.g. IVF cells).

    Returns ``{"written": n, "skipped": n, "rows_written": n}``.  A
    second call with the same inputs writes only the partitions whose
    ``_DONE`` marker is missing (crashed or never-started ones).
    """
    if assign not in ("hash", "direct"):
        raise ValueError(f"assign must be 'hash' or 'direct', got {assign!r}")
    os.makedirs(out_dir, exist_ok=True)
    # Partition assignment is a pure function of (key, num_partitions);
    # resuming with DIFFERENT parameters would skip partitions computed
    # under the old modulus and silently produce a mixed export (round-2
    # ADVICE).  Pin the parameters on first run, fail loud on mismatch.
    meta_path = os.path.join(out_dir, "_meta.json")
    params = {"key": key, "num_partitions": num_partitions, "assign": assign}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prior = json.load(f)
        if prior != params:
            raise ValueError(
                f"resume parameter mismatch for {out_dir}: this export was "
                f"started with {prior}, now called with {params} — finish it "
                f"with the original parameters or export to a fresh out_dir"
            )
    else:
        with open(meta_path, "w") as f:
            json.dump(params, f)
    done = {
        p
        for p in range(num_partitions)
        if os.path.exists(os.path.join(_partition_dir(out_dir, p), "_DONE"))
    }
    if len(done) == num_partitions:
        return {"written": 0, "skipped": num_partitions, "rows_written": 0}

    tagged = ds.map_batches(
        _assign_partition,
        batch_format="pyarrow",
        fn_kwargs={"key": key, "num_partitions": num_partitions, "assign": assign},
    )
    if done:
        done_arr = np.array(sorted(done), dtype=np.int32)

        def _drop_done(batch: pa.Table) -> pa.Table:
            part = np.asarray(batch.column(_PART_COL))
            keep = ~np.isin(part, done_arr)
            return batch.filter(pa.array(keep))

        tagged = tagged.map_batches(_drop_done, batch_format="pyarrow")

    from .functions.blocks import compact_small_result

    receipts = tagged.groupby(_PART_COL).map_groups(
        _write_group,
        batch_format="pyarrow",
        fn_kwargs={"out_dir": out_dir, "sort_key": sort_key},
    )
    # one tiny receipt row per partition; compacting drops the groupby
    # sort's schema-less empty blocks before they hit the driver
    results = compact_small_result(
        receipts,
        pa.schema([("partition", pa.int32()), ("rows", pa.int64())]),
    ).take_all()
    # Hash partitions that received zero rows produce no group — mark them
    # done (marker only, no data file) so the next call's all-done fast
    # path is reachable and a resume never re-shuffles the dataset just to
    # write nothing.
    written_parts = {r["partition"] for r in results}
    empties = 0
    for p in range(num_partitions):
        if p not in done and p not in written_parts:
            d = _partition_dir(out_dir, p)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "_DONE"), "w") as f:
                f.write("0")
            empties += 1
    return {
        "written": len(results) + empties,
        "skipped": len(done),
        "rows_written": sum(r["rows"] for r in results),
    }


def read_partitioned_parquet(out_dir: str) -> ray.data.Dataset:
    """Read back a completed export (only partitions with ``_DONE``).

    The marker records the committed row count, so a marker whose data
    file is MISSING distinguishes two cases: count 0 is a committed
    empty partition (markers only, no file — skipped), while a nonzero
    count means the data file was lost after commit — that raises loud
    instead of silently returning a dataset missing those rows.
    """
    paths = []
    n_markers = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        marker = os.path.join(d, "_DONE")
        if not (name.startswith("part=") and os.path.exists(marker)):
            continue
        n_markers += 1
        data = os.path.join(d, "data.parquet")
        if os.path.exists(data):
            paths.append(data)
            continue
        with open(marker) as f:
            committed_rows = int(f.read().strip() or 0)
        if committed_rows:
            raise FileNotFoundError(
                f"{data} is missing but its _DONE marker committed "
                f"{committed_rows} rows — the export is damaged, not empty"
            )
    if not n_markers:
        raise FileNotFoundError(f"no completed partitions under {out_dir}")
    if not paths:  # a committed export of a genuinely empty dataset
        return ray.data.from_items([])
    # columns pinned to the file schema so the part=NNNNN path segment is
    # not hive-inferred as an extra column
    cols = [f.name for f in pq.read_schema(paths[0])]
    return ray.data.read_parquet(paths, columns=cols)
