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
from concurrent.futures import ThreadPoolExecutor

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
    unc_bytes = sum(
        meta.row_group(i).total_byte_size for i in range(meta.num_row_groups)
    )
    return _blocks_from_stats(meta.num_rows, unc_bytes, rows_per_block)


def _blocks_from_stats(
    rows: int, unc_bytes: int, rows_per_block: int | None
) -> int | None:
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
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # cap at the CPU count deliberately: a 4×-cpus cap was measured to
    # help ragged decode stragglers slightly (pricing 5.2→4.9 s) but
    # cost 3× on exchange-bound scans (window_agg 1.4→5.1 s at 16 cpus,
    # 256× fixture) — block count here IS the downstream sort-exchange
    # partition count, and tiny-partial exchanges price by block
    rows_based = min(-(-rows // rows_per_block), max(cpus, 1))
    bytes_based = -(-unc_bytes // _BYTES_PER_BLOCK)
    return max(rows_based, bytes_based, 1)


#: driver-side fragment planning caps: beyond this many files (or
#: footer bytes to read serially-ish) fall back to Ray's reader, whose
#: metadata prefetch is itself distributed.
_MAX_PLAN_FILES = 4096
_FOOTER_THREADS = 16


def _read_units(batch: pa.Table, *, columns, split: int = 1):
    """One fragment-read task: decode this task's (path, row-group
    range) units, column-pruned at the footer, metadata-stripped.

    Yields one table per unit (never concatenates) so task heap stays
    bounded by ONE unit (~:data:`_BYTES_PER_BLOCK` uncompressed) and
    Ray's dynamic block splitting sees each unit separately.
    ``split > 1`` yields that many zero-copy slices per unit instead —
    the fan-out path for a file with fewer row groups than the wanted
    block count (decode parallelism is bounded by row groups; block
    count need not be).
    """
    paths = batch.column("p").to_pylist()
    los = batch.column("lo").to_pylist()
    his = batch.column("hi").to_pylist()
    for p, a, b in zip(paths, los, his):
        pf = pq.ParquetFile(p)
        if b > a:
            t = pf.read_row_groups(list(range(a, b)), columns=columns)
        else:  # zero-row-group (empty) file: schema-only table
            t = pf.schema_arrow.empty_table()
        if columns is not None:
            t = t.select(columns)  # pin projection ORDER, not just set
        if t.schema.metadata:
            t = t.replace_schema_metadata(None)
        if split > 1 and t.num_rows >= split:
            step = -(-t.num_rows // split)
            for off in range(0, t.num_rows, step):
                yield t.slice(off, step)
        else:
            yield t


def _plan_fragment_units(files: list[str], nb: int | None, auto_blocks):
    """Footer-plan a fragment scan over ``files``.

    Reads every footer in a driver thread pool (cheap: metadata only —
    Ray's own reader fetches the same footers, just in remote tasks)
    and refuses when the files don't share ONE schema (Ray's reader
    handles cross-file schema unification; this path must not guess).

    Each file splits into contiguous row-group ranges capped at
    ``min(_BYTES_PER_BLOCK, total_unc / want)`` uncompressed — the
    first term keeps one unit worker-heap-friendly at lake scale, the
    second sub-splits a SINGLE many-row-group file to the wanted
    parallelism (a 64-file directory naturally yields ≥64 units and is
    untouched by it).

    Returns ``(units, nb_resolved, first_footer, total_unc)`` or
    ``None`` when the plan shouldn't be used.  ``nb_resolved`` is the
    explicit/auto block count to coalesce to (``None`` → one task per
    unit); ``total_unc`` is the summed uncompressed row-group bytes
    (the fan-out fusion-regime estimate);
    ``first_footer`` is the already-parsed ``ParquetFile`` when the
    input is a SINGLE file (so that caller doesn't re-parse the
    footer), ``None`` otherwise — multi-file footers are extracted and
    closed inside the pool to bound open fds.

    ``NPR_READ_ROWS_PER_BLOCK=0`` disables this path entirely (the
    documented escape hatch back to Ray's own reader, e.g. to bisect a
    fragment-read suspicion or to keep many-tiny-block fixtures).
    """
    if not files or len(files) > _MAX_PLAN_FILES:
        return None
    if os.environ.get("NPR_READ_ROWS_PER_BLOCK") == "0":
        return None
    def _footer(p):
        # extract and CLOSE inside the pool worker: open fds stay
        # bounded by the pool size, never by the file count (a ~1500
        # file directory under ulimit -n 1024 must not EMFILE the
        # driver mid-plan)
        f = pq.ParquetFile(p)
        try:
            return f.schema_arrow, f.metadata
        finally:
            f.close()

    pf0 = None
    try:
        if len(files) == 1:
            pf0 = pq.ParquetFile(files[0])
            footers = [(pf0.schema_arrow, pf0.metadata)]
        else:
            with ThreadPoolExecutor(min(_FOOTER_THREADS, len(files))) as ex:
                footers = list(ex.map(_footer, files))
    except Exception:
        return None
    schema = footers[0][0].remove_metadata()
    if any(s.remove_metadata() != schema for s, _ in footers[1:]):
        return None
    metas = [m for _, m in footers]
    total_rows = sum(m.num_rows for m in metas)
    total_unc = sum(
        m.row_group(i).total_byte_size
        for m in metas
        for i in range(m.num_row_groups)
    )
    if nb is None and auto_blocks:
        nb = _blocks_from_stats(
            total_rows, total_unc, None if auto_blocks is True else int(auto_blocks)
        )
    want = nb if nb is not None else _blocks_from_stats(total_rows, total_unc, None)
    cap = _BYTES_PER_BLOCK
    if want and want > 0:
        cap = max(1, min(cap, -(-total_unc // want)))
    units: list[dict] = []
    for p, m in zip(files, metas):
        lo = 0
        acc = 0
        for i in range(m.num_row_groups):
            acc += m.row_group(i).total_byte_size
            if acc >= cap:
                units.append({"p": p, "lo": lo, "hi": i + 1})
                lo, acc = i + 1, 0
        if lo < m.num_row_groups or m.num_row_groups == 0:
            units.append({"p": p, "lo": lo, "hi": m.num_row_groups})
    return units, nb, pf0, total_unc  # pf0 only for single-file schema reuse


def _list_parquet_files(paths) -> list[str] | None:
    """Expand ``paths`` to a flat list of local parquet files, or
    ``None`` when the input isn't shaped for the fragment path (remote
    URIs, mixed content, missing files).  Directories walk recursively
    in sorted order (Ray's lexicographic listing); explicit lists keep
    caller order.  A directory containing any unexpected regular file
    is rejected rather than silently skipped — Ray's reader defines the
    semantics there."""
    if isinstance(paths, str):
        if os.path.isfile(paths):
            return [paths]
        if os.path.isdir(paths):
            out: list[str] = []
            for root, dirs, names in os.walk(paths):
                if any("=" in d for d in dirs):
                    # hive-partitioned layout: Ray's reader infers the
                    # key=value path segments as COLUMNS — the fragment
                    # path reads footers only and would silently drop
                    # them (probed divergence, round 5)
                    return None
                if any(os.path.islink(os.path.join(root, d)) for d in dirs):
                    # symlinked subdirectory: pyarrow dataset discovery
                    # (Ray's reader) FOLLOWS directory symlinks, but
                    # os.walk(followlinks=False) does not — descending
                    # ourselves risks cycles, so keep Ray's semantics
                    # by refusing the plan (probed divergence: Ray read
                    # 4 rows, this lister returned 2)
                    return None
                # prune hidden/marker DIRECTORIES too: Ray ignores
                # '_'/'.'-prefixed path segments, so a _staging/ or
                # Spark _temporary/ subtree must never be read as
                # committed data (probed divergence, round-5 review)
                dirs[:] = sorted(d for d in dirs if not d.startswith(("_", ".")))
                for n in sorted(names):
                    if n.startswith(("_", ".")):
                        continue  # markers/hidden: Ray skips these too
                    if not n.endswith((".parquet", ".pq")):
                        return None
                    out.append(os.path.join(root, n))
            return out or None
        return None
    if isinstance(paths, (list, tuple)):
        flat: list[str] = []
        for p in paths:
            sub = _list_parquet_files(p) if isinstance(p, str) else None
            if sub is None:
                return None
            flat.extend(sub)
        return flat or None
    return None


def _dir_auto_blocks(path: str, rows_per_block: int | None) -> int | None:
    """Footer-stat block sizing for a directory read the fragment plan
    can't take (hive layout, mixed schemas) — auto_blocks must not
    silently degrade to Ray's ~200-near-empty-block exchange overhead
    just because the layout forced Ray's reader.  Walks ALL parquet
    files (hive subdirs included; rows/bytes don't care about inferred
    columns), skipping hidden/marker segments like Ray does."""
    files: list[str] = []
    # followlinks=True to see the same file set Ray's reader does
    # (pyarrow discovery follows directory symlinks); the visited set
    # guards symlink cycles.  Kept separate from _list_parquet_files on
    # purpose: this walker INCLUDES hive subdirs and ignores foreign
    # files (block sizing cares about rows/bytes, not layout semantics),
    # where the fragment lister must refuse both.
    seen: set[str] = set()
    for root, dirs, names in os.walk(path, followlinks=True):
        real = os.path.realpath(root)
        if real in seen:
            dirs[:] = []
            continue
        seen.add(real)
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        files.extend(
            os.path.join(root, n)
            for n in names
            if n.endswith((".parquet", ".pq")) and not n.startswith(("_", "."))
        )
        if len(files) > _MAX_PLAN_FILES:
            return None
    if not files:
        return None
    try:
        with ThreadPoolExecutor(min(_FOOTER_THREADS, len(files))) as ex:
            metas = list(ex.map(lambda p: pq.ParquetFile(p).metadata, files))
    except Exception:
        return None
    rows = sum(m.num_rows for m in metas)
    unc = sum(
        m.row_group(i).total_byte_size for m in metas for i in range(m.num_row_groups)
    )
    return _blocks_from_stats(rows, unc, rows_per_block)


def _fragment_read(
    units: list[dict], columns, num_tasks: int | None, total_unc: int = 0
) -> ray.data.Dataset:
    """Fragment-parallel parquet scan (single file OR directory/list).

    Ray's parquet reader decodes a single FILE in a single read task no
    matter what ``override_num_blocks`` says (SplitBlocks only re-splits
    AFTER the serial decode), and its multi-file scanner pays a
    measured ~4× decode overhead vs a plain per-file
    ``ParquetFile.read`` (38.4M-row lineitem, warm cache: 2.85 s vs
    0.64 s at 8 cpus).  This path plans (path, row-group range) units
    on the driver (footer metadata only) and decodes each in its own
    Ray task — scan parallelism then depends on data layout, never on
    how many files the producer happened to write.  (The reference's
    analogous always-parallel source is the per-shard consumption in
    consumer/GetKinesisStream.java:105,176-180.)
    """
    nb = len(units) if num_tasks is None else max(1, min(num_tasks, len(units)))
    # wanted MORE blocks than the layout has row-group units (Ray's
    # reader would have delivered the request via SplitBlocks after its
    # serial decode): decode at unit granularity, then yield zero-copy
    # slices so downstream fan-out still reaches the request
    split = 1 if num_tasks is None else max(1, -(-num_tasks // len(units)))
    ds = ray.data.from_items(units, override_num_blocks=nb).map_batches(
        _read_units,
        batch_format="pyarrow",
        batch_size=None,
        fn_kwargs={"columns": columns, "split": split},
    )
    if split > 1:
        # small-data regime: Ray re-fuses yielded slices into one block
        # per task when they sit under target_max_block_size, silently
        # capping fan-out at the unit count — repartition to honor the
        # request (cheap at exactly the sizes where fusion happens; in
        # the large regime the slices survive as blocks and this branch
        # is skipped)
        target = ray.data.DataContext.get_current().target_max_block_size or (
            128 << 20
        )
        if total_unc and num_tasks and total_unc // num_tasks < target:
            ds = ds.repartition(num_tasks)
    return ds


def read_parquet(
    paths,
    *,
    columns: list[str] | None = None,
    auto_blocks: bool | int = False,
    **kwargs,
) -> ray.data.Dataset:
    """``ray.data.read_parquet`` that yields metadata-free block schemas.

    ``auto_blocks=True`` sizes ``override_num_blocks`` from the footers
    (:func:`suggest_scan_blocks`) — use on scans that feed a sort
    exchange, not on compute-heavy per-row stages.  Pass an int to set
    the rows-per-block target instead of the 64k default (compute-heavy
    stages over few rows want a SMALL target so they still fan out to
    the CPUs).  An explicit ``override_num_blocks`` always wins.

    Reads that can be footer-planned take the fragment path
    (:func:`_fragment_read`): a single file with multiple row groups
    decodes its row-group ranges in parallel tasks (Ray's own reader is
    serial per file), and a directory / file list with ONE shared
    schema decodes per-file (measured ~4× faster than Ray's multi-file
    scanner, warm).  Reads with pushed ``filter=``/other kwargs, remote
    URIs, mixed-schema directories, or >4096 files keep Ray's reader.
    A single single-row-group file (all the small testdata fixtures)
    also keeps Ray's reader: one decode task either way, and Ray's
    SplitBlocks still fans the downstream out to ``override_num_blocks``.
    """
    plan = None
    if set(kwargs) <= {"override_num_blocks"}:  # filter/other kwarg → Ray
        files = _list_parquet_files(paths)
        if files is not None:
            plan = _plan_fragment_units(
                files, kwargs.get("override_num_blocks"), auto_blocks
            )
    pf = None
    if plan is not None:
        units, nb, pf0, total_unc = plan
        if len(units) > 1:
            return _fragment_read(units, columns, nb, total_unc)
        # single-unit plan: Ray's reader below (SplitBlocks handles any
        # wanted fan-out; the fragment path cannot split below a unit)
        if nb is not None:
            kwargs["override_num_blocks"] = nb
        if isinstance(paths, str) and os.path.isfile(paths):
            pf = pf0  # reuse the plan's footer parse for the clean schema
    elif isinstance(paths, str) and os.path.isfile(paths):
        try:
            pf = pq.ParquetFile(paths)  # footer parse for blocks + schema
        except Exception:
            pf = None
        # reads the plan can't take (pushed filter=, env escape hatch)
        # still get footer-sized blocks — auto_blocks must not silently
        # degrade to Ray's ~200-near-empty-block exchange overhead
        if auto_blocks and pf is not None and "override_num_blocks" not in kwargs:
            nb2 = _blocks_from_meta(
                pf.metadata, None if auto_blocks is True else int(auto_blocks)
            )
            if nb2 is not None:
                kwargs["override_num_blocks"] = nb2
    elif (
        auto_blocks
        and "override_num_blocks" not in kwargs
        and isinstance(paths, str)
        and os.path.isdir(paths)
        and os.environ.get("NPR_READ_ROWS_PER_BLOCK") != "0"
    ):
        # directory reads that fell back to Ray's reader (hive layout,
        # mixed schemas) keep footer-sized blocks the same way
        nb2 = _dir_auto_blocks(paths, None if auto_blocks is True else int(auto_blocks))
        if nb2 is not None:
            kwargs["override_num_blocks"] = nb2
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
