"""Change-event tailer — the ``GetKinesisStream`` role.

The reference tails a sharded stream via the KCL: per-shard leases,
ordered batches, a checkpoint of the last processed record
(``consumer/GetKinesisStream.java:75-347``).  Ray-Data-natively, the
"stream" is an ordered, partitioned Parquet change log; tailing is
reading the next seq window ``(watermark, hi]`` as a ``Dataset``:

- **Offset pruning at the read**: parquet footer statistics give each
  file's ``[seq_min, seq_max]``; files outside the window never leave
  storage, and a row-group filter (``seq > lo AND seq <= hi``) is pushed
  into the scan for the files that remain — the analog of resuming a
  shard iterator at a sequence number rather than TRIM_HORIZON.
- **Schema drift**: old log files may physically lack late-added columns
  (``tool``).  Files are grouped by physical schema and read per group;
  the downstream validate stage aligns every batch onto the unified
  changelog schema (``schema.align_to_schema``).
- ``initial_position`` LATEST/TRIM_HORIZON (the reference's
  ``consumer/AbstractKinesisConsumerProcessor.java:84-95``) maps to
  starting the watermark at the head or at -1.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data


@dataclass(frozen=True)
class LogFileInfo:
    path: str
    seq_min: int
    seq_max: int
    columns: tuple[str, ...]


def _jsonl_read_table(p: str) -> pa.Table:
    """One JSONL change-log segment, parsed onto the changelog schema.

    ``explicit_schema`` pins every envelope type at the parse (ISO
    strings → timestamp[us], ints → int32 turn_idx) — inference would
    quietly downgrade fractional timestamps to second precision.  Keys
    missing from a segment (early files without ``tool``) parse as null
    columns, preserving the schema-evolution story; unexpected extra
    keys ride along for the validate stage to drop."""
    from pyarrow import json as pajson

    from ..schema import CHANGELOG_SCHEMA

    return pajson.read_json(
        p,
        parse_options=pajson.ParseOptions(
            explicit_schema=CHANGELOG_SCHEMA, unexpected_field_behavior="infer"
        ),
    )


def _csv_convert_options():
    """Arrow CSV conversion pinned to the changelog schema and the
    null/empty-string convention the CSV export writes: an UNQUOTED
    empty field is null, a QUOTED ``""`` is the empty string — so a
    null payload still reaches validate's reject route after the
    format hop.  Absent columns (early segments without ``tool``)
    simply don't appear; the validate stage null-fills them like it
    does for drifted parquet segments."""
    from pyarrow import csv as pacsv

    from ..schema import CHANGELOG_SCHEMA

    return pacsv.ConvertOptions(
        column_types={f.name: f.type for f in CHANGELOG_SCHEMA},
        strings_can_be_null=True,
        quoted_strings_can_be_null=False,
    )


def _csv_parse_options():
    """``newlines_in_values=True``: transcript text legitimately embeds
    newlines (quoted by the writer), and Arrow's default rejects them
    once a file is large enough to parse in chunks.  Costs intra-file
    parse parallelism; the segment SET provides the parallelism."""
    from pyarrow import csv as pacsv

    return pacsv.ParseOptions(newlines_in_values=True)


def _csv_read_table(p: str) -> pa.Table:
    """One CSV change-log segment, parsed under the tailer's pinned
    conversion conventions (see :func:`_csv_convert_options`)."""
    from pyarrow import csv as pacsv

    return pacsv.read_csv(
        p, convert_options=_csv_convert_options(), parse_options=_csv_parse_options()
    )


def _scan_one_text(p: str, read_table) -> LogFileInfo | None:
    """Shared seq-bounds scan for the text formats (JSONL/CSV) — a FULL
    driver-side parse (no footer statistics).  Production-scale logs
    should tail parquet segments (O(footer) scans); the text surfaces
    exist for stream parity with the reference and their scan cost is
    honest: O(file) once per segment, amortized by the engine's
    mtime/size scan cache exactly like parquet footers."""
    try:
        t = read_table(p)
    except (pa.ArrowInvalid, OSError):
        return None  # half-written / vanished file: retry next scan
    if t.num_rows == 0:
        return None  # empty segment: contributes nothing to any window
    if "seq" not in t.column_names:
        # same error contract as the parquet scan: name the bad file
        # (JSONL is immune — the explicit schema injects the column —
        # but a headerless/misproduced CSV hits this)
        raise ValueError(f"changelog file has no 'seq' column: {p}")
    seqs = t.column("seq")
    lo, hi = pc.min(seqs).as_py(), pc.max(seqs).as_py()
    if lo is None:
        raise ValueError(f"changelog file has only null seq values: {p}")
    # physical columns = keys actually present (absent keys parse all-null
    # under an explicit schema): report only the present names so drifted
    # segments group like their parquet counterparts
    return LogFileInfo(p, int(lo), int(hi), tuple(t.column_names))


def _scan_one_csv(p: str) -> LogFileInfo | None:
    return _scan_one_text(p, _csv_read_table)


def _scan_one_jsonl(p: str) -> LogFileInfo | None:
    return _scan_one_text(p, _jsonl_read_table)


def _scan_one(p: str) -> LogFileInfo | None:
    if p.endswith(".jsonl"):
        return _scan_one_jsonl(p)
    if p.endswith(".csv"):
        return _scan_one_csv(p)
    try:
        md = pq.ParquetFile(p)
    except (pa.ArrowInvalid, OSError):
        return None  # half-written / vanished file: retry next scan
    schema = md.schema_arrow
    seq_idx = schema.get_field_index("seq")
    if seq_idx < 0:
        raise ValueError(f"changelog file has no 'seq' column: {p}")
    lo, hi = None, None
    meta = md.metadata
    for rg in range(meta.num_row_groups):
        st = meta.row_group(rg).column(seq_idx).statistics
        if st is None or not st.has_min_max:
            lo, hi = None, None
            break
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        # No footer stats (producer wrote with write_statistics=False).
        # Read the seq column itself for exact bounds — a sentinel
        # range would poison head_seq() and send replay() into a
        # near-endless empty-epoch loop toward a 2^62 "head".
        seqs = pq.read_table(p, columns=["seq"]).column("seq")
        if len(seqs) == 0:
            return None  # empty file: contributes nothing to any window
        lo = pc.min(seqs).as_py()
        hi = pc.max(seqs).as_py()
        if lo is None:
            raise ValueError(f"changelog file has only null seq values: {p}")
    return LogFileInfo(p, int(lo), int(hi), tuple(schema.names))


def scan_log(paths: list[str], max_workers: int = 16) -> list[LogFileInfo]:
    """Read footer metadata (driver-side, cheap) for offset pruning.

    A file that cannot be opened as parquet is SKIPPED this scan (a
    producer may still be mid-write when a follow poll lands — the next
    poll retries it once complete; the engine's scan cache only caches
    successful reads).  A readable file that is structurally wrong for a
    changelog (no ``seq`` column, or only null seqs with no stats) is a
    configuration error and raises with the filename — silence there
    would hide real data loss.

    Footer reads are I/O-bound and release the GIL in Arrow, so a large
    backlog (first scan of a 10^5-file retained log, or a follow poll
    landing on a burst of new segments) fans out over a thread pool
    instead of serializing the driver; output order stays deterministic
    (sorted by path).
    """
    sorted_paths = sorted(paths)
    if len(sorted_paths) <= 4:
        infos = [_scan_one(p) for p in sorted_paths]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(max_workers, len(sorted_paths))) as ex:
            infos = list(ex.map(_scan_one, sorted_paths))
    return [i for i in infos if i is not None]


def discover_log_files(paths_or_dirs: list[str] | tuple[str, ...]) -> list[str]:
    files = []
    for p in paths_or_dirs:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f)
                for f in sorted(os.listdir(p))
                if f.endswith((".parquet", ".jsonl", ".csv"))
            )
        else:
            files.append(p)
    return files


def head_seq(infos: list[LogFileInfo]) -> int:
    """The tail position of the log (max committed seq)."""
    return max((i.seq_max for i in infos), default=-1)


def read_window(
    infos: list[LogFileInfo],
    lo: int,
    hi: int,
    *,
    concurrency: int | None = None,
    num_blocks: int | None = None,
) -> ray.data.Dataset | None:
    """Dataset of change events with ``lo < seq <= hi``.

    Returns None when no file intersects the window.  Blocks may have
    heterogeneous physical schemas (drifted files); the validate stage
    unifies them.  ``num_blocks`` overrides Ray's size-based block
    coalescing (which would otherwise serialize the downstream shuffle
    + merge when the window is small relative to 128 MiB blocks).
    """
    live = [i for i in infos if i.seq_max > lo and i.seq_min <= hi]
    if not live:
        return None
    flt = (pc.field("seq") > lo) & (pc.field("seq") <= hi)
    if lo < 0:
        # Initial (TRIM_HORIZON) window only: also surface null-seq rows
        # so they reach validate's reject routing exactly once — a plain
        # range filter silently drops them (null predicate → filtered),
        # which would be unrecorded data loss.
        flt = flt | pc.field("seq").is_null()
    jsonl = [i for i in live if i.path.endswith(".jsonl")]
    csvs = [i for i in live if i.path.endswith(".csv")]
    parq = [i for i in live if not i.path.endswith((".jsonl", ".csv"))]
    by_schema: dict[tuple[str, ...], list[str]] = {}
    for i in parq:
        by_schema.setdefault(i.columns, []).append(i.path)
    parts = [
        ray.data.read_parquet(
            ps,
            filter=flt,
            concurrency=concurrency,
            override_num_blocks=(
                max(1, num_blocks * len(ps) // len(live)) if num_blocks else None
            ),
        )
        for ps in by_schema.values()
    ]
    def _window_filter(b: pa.Table) -> pa.Table:
        # text formats have no row-group pushdown: the window filter runs
        # as the first fused map over the parsed blocks instead (same
        # predicate, including the TRIM_HORIZON null-seq surfacing)
        m = pc.and_kleene(
            pc.greater(b.column("seq"), pa.scalar(lo, pa.int64())),
            pc.less_equal(b.column("seq"), pa.scalar(hi, pa.int64())),
        )
        if lo < 0:
            m = pc.or_kleene(m, pc.is_null(b.column("seq")))
        return b.filter(pc.fill_null(m, False))

    if jsonl:
        from pyarrow import json as pajson

        from ..schema import CHANGELOG_SCHEMA

        ds_j = ray.data.read_json(
            [i.path for i in jsonl],
            parse_options=pajson.ParseOptions(
                explicit_schema=CHANGELOG_SCHEMA, unexpected_field_behavior="infer"
            ),
            concurrency=concurrency,
            override_num_blocks=(
                max(1, num_blocks * len(jsonl) // len(live)) if num_blocks else None
            ),
        )
        parts.append(ds_j.map_batches(_window_filter, batch_format="pyarrow"))
    if csvs:
        # CSV segments group by physical columns like parquet (absent
        # columns — schema evolution — yield per-group uniform schemas;
        # the validate stage unifies across groups)
        csv_by_schema: dict[tuple[str, ...], list[str]] = {}
        for i in csvs:
            csv_by_schema.setdefault(i.columns, []).append(i.path)
        for ps in csv_by_schema.values():
            ds_c = ray.data.read_csv(
                ps,
                convert_options=_csv_convert_options(),
                parse_options=_csv_parse_options(),
                concurrency=concurrency,
                override_num_blocks=(
                    max(1, num_blocks * len(ps) // len(live)) if num_blocks else None
                ),
            )
            parts.append(ds_c.map_batches(_window_filter, batch_format="pyarrow"))
    ds = parts[0]
    for other in parts[1:]:
        ds = ds.union(other)
    return ds
