"""Metadata-clean parquet reader.

The driver's testdata parquet files (and any pandas-written parquet)
carry a ``b'pandas'`` schema-metadata blob whose decoded form is
unhashable; Ray Data's block-schema deduplication then logs
``Failed to hash the schemas (for deduplication): unhashable type:
'dict'`` once per read task and block — hundreds of lines per bench
run — and loses the dedup benefit.

Fix at the source: read the footer schema once on the driver, strip the
metadata, project it to the requested columns, and hand Ray the CLEAN
schema — every block then carries hashable schemas from the first
operator on.  Falls back to a per-batch metadata strip (zero-copy
schema swap) for inputs where the footer can't be pre-read (directories,
multi-file globs).
"""

from __future__ import annotations

import functools
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _strip_schema_metadata(batch: pa.Table) -> pa.Table:
    return batch.replace_schema_metadata(None) if batch.schema.metadata else batch


#: auto block sizing targets (see :func:`suggest_scan_blocks`)
_ROWS_PER_BLOCK = 65536
_BYTES_PER_BLOCK = 256 << 20


def suggest_scan_blocks(path: str, rows_per_block: int | None = None) -> int | None:
    """Footer-derived ``override_num_blocks`` for EXCHANGE-BOUND scans.

    Ray's default read parallelism floor (~200 blocks) is tuned for
    big inputs; feeding a sort exchange 200 near-empty blocks makes the
    exchange pay ~200 partition tasks of pure overhead (measured 6 s →
    0.5 s on a 24k-row join hop at sf0.1).  Blocks should scale with
    DATA, not a constant:

    - rows-based: one block per ~64k rows, capped at the session's CPU
      count (small inputs never fan out wider than the machine);
    - bytes-based floor: one block per ~256 MB uncompressed (footer
      row-group sizes), UNCAPPED — at lake scale this term dominates
      and keeps per-block memory bounded no matter the CPU cap.

    Returns ``None`` (caller falls back to Ray's default) when the
    footer can't be read.  Only suitable for scans whose per-row work
    is light (side maps, combiners); compute-heavy ops (minhash over
    documents) want MORE blocks than rows suggest and should keep
    Ray's default.
    """
    try:
        meta = pq.ParquetFile(path).metadata
    except Exception:
        return None
    return _blocks_from_meta(meta, rows_per_block)


def _blocks_from_meta(meta, rows_per_block: int | None) -> int | None:
    env = os.environ.get("NPR_READ_ROWS_PER_BLOCK")
    if env is not None:  # env wins: 0 disables auto sizing entirely
        try:
            rows_per_block = int(env)
        except ValueError:
            rows_per_block = None
    if rows_per_block is None:
        rows_per_block = _ROWS_PER_BLOCK
    if rows_per_block <= 0:  # escape hatch: Ray's own heuristic
        return None
    rows = meta.num_rows
    unc_bytes = sum(
        meta.row_group(i).total_byte_size for i in range(meta.num_row_groups)
    )
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    rows_based = min(-(-rows // rows_per_block), max(cpus, 1))
    bytes_based = -(-unc_bytes // _BYTES_PER_BLOCK)
    return max(rows_based, bytes_based, 1)


def _read_rg_range(batch: pa.Table, *, path: str, columns) -> pa.Table:
    """One fragment-read task: open the file, decode this task's
    row-group range (column-pruned at the footer), metadata-stripped."""
    lo = batch.column("lo").to_pylist()
    hi = batch.column("hi").to_pylist()
    pf = pq.ParquetFile(path)
    tables = [
        pf.read_row_groups(list(range(a, b)), columns=columns).replace_schema_metadata(
            None
        )
        for a, b in zip(lo, hi)
    ]
    return tables[0] if len(tables) == 1 else pa.concat_tables(tables)


def _fragment_read(
    path: str, meta, columns, num_tasks: int
) -> ray.data.Dataset:
    """Row-group-parallel scan of ONE parquet file.

    Ray's parquet reader decodes a single FILE in a single read task no
    matter what ``override_num_blocks`` says (SplitBlocks only re-splits
    AFTER the serial decode) — so a user pointing the engine at one big
    file gets a serial scan.  This path plans contiguous row-group
    ranges on the driver (footer metadata only) and decodes each range
    in its own Ray task — scan parallelism then depends on the file's
    row-group layout, never on how many files the producer happened to
    write.  (The reference's analogous always-parallel source is the
    per-shard consumption in consumer/GetKinesisStream.java:105,176-180.)
    """
    n_rgs = meta.num_row_groups
    num_tasks = max(1, min(num_tasks, n_rgs))
    # contiguous ranges balanced by ROWS (row groups can be ragged)
    rows = [meta.row_group(i).num_rows for i in range(n_rgs)]
    total = sum(rows)
    bounds = [0]
    acc = 0
    for i, r in enumerate(rows):
        acc += r
        if acc >= total * len(bounds) / num_tasks and len(bounds) < num_tasks:
            bounds.append(i + 1)
    bounds.append(n_rgs)
    ranges = [
        {"lo": a, "hi": b} for a, b in zip(bounds[:-1], bounds[1:]) if b > a
    ]
    return ray.data.from_items(
        ranges, override_num_blocks=len(ranges)
    ).map_batches(
        _read_rg_range,
        batch_format="pyarrow",
        batch_size=None,
        fn_kwargs={"path": path, "columns": columns},
    )


def read_parquet(
    paths,
    *,
    columns: list[str] | None = None,
    auto_blocks: bool | int = False,
    **kwargs,
) -> ray.data.Dataset:
    """``ray.data.read_parquet`` that yields metadata-free block schemas.

    ``auto_blocks=True`` sizes ``override_num_blocks`` from the footer
    (:func:`suggest_scan_blocks`) for single-file reads — use on scans
    that feed a sort exchange, not on compute-heavy per-row stages.
    Pass an int to set the rows-per-block target instead of the 64k
    default (compute-heavy stages over few rows want a SMALL target so
    they still fan out to the CPUs).  An explicit
    ``override_num_blocks`` always wins.

    A single file with MULTIPLE row groups that wants >1 block takes the
    row-group fragment path (:func:`_fragment_read`) — Ray's own reader
    would decode it serially in one task.  Single-row-group files (all
    the small testdata fixtures) keep Ray's reader unchanged.
    """
    single_file = isinstance(paths, str) and os.path.isfile(paths)
    pf = None
    if single_file:
        try:
            pf = pq.ParquetFile(paths)  # ONE footer parse for blocks + schema
        except Exception:
            pf = None
    nb = kwargs.get("override_num_blocks")
    if auto_blocks and pf is not None and nb is None:
        nb = _blocks_from_meta(
            pf.metadata, None if auto_blocks is True else int(auto_blocks)
        )
        if nb is not None:
            kwargs["override_num_blocks"] = nb
    if (
        pf is not None
        and pf.metadata.num_row_groups > 1
        and set(kwargs) <= {"override_num_blocks"}  # a filter/other kwarg → Ray's reader
    ):
        # want >1 block?  (explicit/auto nb, else Ray's default — which
        # always wants parallelism for a file big enough to carry
        # multiple row groups)
        want = nb if nb is not None else _blocks_from_meta(pf.metadata, None)
        if want and want > 1:
            return _fragment_read(paths, pf.metadata, columns, want)
    schema = None
    if pf is not None:
        try:
            sch = pf.schema_arrow.remove_metadata()
            if columns is not None:
                sch = pa.schema([sch.field(c) for c in columns])
            schema = sch
        except Exception:
            schema = None
    if schema is not None:
        return ray.data.read_parquet(paths, columns=columns, schema=schema, **kwargs)
    ds = ray.data.read_parquet(paths, columns=columns, **kwargs)
    return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow")


#: named auto-block presets — ONE home for the tuning rationale.
#: ``read_parquet_exchange``: scans whose per-row work is light and whose
#: output feeds a sort exchange — blocks sized ~64k rows so the exchange
#: doesn't pay Ray's ~200-block floor in per-partition overhead.
#: ``read_parquet_fanout``: compute-heavy per-row stages over small-row
#: tables (documents/embeddings) — ~64 rows per block so they still fan
#: out to the CPUs.  Both keep the 256 MB uncompressed bytes floor for
#: lake-scale files (see :func:`suggest_scan_blocks`).
read_parquet_exchange = functools.partial(read_parquet, auto_blocks=True)
read_parquet_fanout = functools.partial(read_parquet, auto_blocks=64)


def read_jsonl(paths, *, columns: list[str] | None = None, schema=None, **kwargs) -> ray.data.Dataset:
    """JSON-lines source for the analysis-ops surface (documents and
    friends arriving as ``.jsonl`` exports rather than parquet).

    Same contract as :func:`read_parquet`: optional column projection
    (applied as a fused ``select_columns`` — JSON has no footer to push
    the projection into) and metadata-free block schemas.  Pass
    ``schema`` (a ``pyarrow.Schema``) to pin types when the JSON values
    are ambiguous (e.g. ints that must stay int64 across empty files).
    """
    read_kwargs = dict(kwargs)
    if schema is not None:
        import pyarrow.json as pa_json

        read_kwargs["parse_options"] = pa_json.ParseOptions(
            explicit_schema=schema, unexpected_field_behavior="infer"
        )
    ds = ray.data.read_json(paths, **read_kwargs)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow")


def read_csv(paths, *, columns: list[str] | None = None, schema=None, **kwargs) -> ray.data.Dataset:
    """CSV source with the same contract as :func:`read_jsonl` (column
    projection + optional explicit column types + metadata-free block
    schemas) — the last of the three tabular ingest formats (parquet /
    jsonl / csv) the analysis operators accept interchangeably."""
    read_kwargs = dict(kwargs)
    if schema is not None:
        import pyarrow.csv as pa_csv

        read_kwargs["convert_options"] = pa_csv.ConvertOptions(
            column_types={f.name: f.type for f in schema}
        )
    ds = ray.data.read_csv(paths, **read_kwargs)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow")
