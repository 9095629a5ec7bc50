"""Deterministic synthetic CDC change streams over transcript tables.

Two generators:

1. ``derive_changelog_from_events`` — derives the change stream as a
   pure function of the driver-provided ``events`` table
   (``/root/testdata/sf*/events.parquet``: contiguous, seq-sorted
   ``event_id``).  The derivation is simple integer/case arithmetic so
   the EXACT same stream is expressible in ANSI SQL
   (``CHANGELOG_FROM_EVENTS_CTE``) — that is what lets the driver's
   DuckDB oracle verify the full CDC replay end-to-end (LWW upsert +
   tombstones + rejects + schema evolution) by a window function.

2. ``generate_changelog`` — a seeded numpy generator producing change
   streams at arbitrary scale (bench: 10^6-10^8 events locally; the
   cluster target is 10^10) with the same scenario mix: inserts,
   updates rewriting ``text``, deletes, invalid rows at arbitrary
   positions, a hot conversation (~20% of all events → skew/salting
   path), and the ``tool`` column physically absent from the first ~30%
   of the stream (schema evolution; files written without that column).

Scenario mix mirrors the reference's test matrix
(``consumer/GetKinesisStreamTest.java:326-481`` — failing records at
arbitrary positions must not fail the batch;
``consumer/GetKinesisStreamTestIT.java:274-321`` — null-payload records).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .schema import CHANGELOG_SCHEMA

ROLES = np.array(["user", "assistant", "tool", "system"])
TOOLS = np.array(["search", "code", "browser"])

# ---------------------------------------------------------------------------
# completion-marker helpers — the _DONE file records the EXACT file set
# written, so a crash mid-write (no marker) triggers a clean regenerate
# and a rerun with different parameters can never mix stale leftovers
# into the returned log.
# ---------------------------------------------------------------------------

def _read_done_marker(out_dir: str) -> list[str] | None:
    marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        names = [ln for ln in f.read().split("\n") if ln and ln != "ok"]
    if names:
        paths = [os.path.join(out_dir, n) for n in names]
        if all(os.path.exists(p) for p in paths):
            return paths
    # legacy "ok" marker or missing files: fall back to a full listing
    return sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")
    )


def _clear_stale_parquet(out_dir: str) -> None:
    for f in os.listdir(out_dir):
        if f.endswith(".parquet"):
            os.remove(os.path.join(out_dir, f))


def _write_done_marker(out_dir: str, paths: list[str]) -> None:
    with open(os.path.join(out_dir, "_DONE"), "w") as f:
        f.write("\n".join(os.path.basename(p) for p in paths))


# ---------------------------------------------------------------------------
# 1. SQL-mirrorable derivation from the `events` table
# ---------------------------------------------------------------------------

# The DuckDB CTE computing the identical change stream from the
# pre-registered `events` view.  Keep in exact lockstep with
# `derive_changelog_from_events` below — tests assert equivalence.
CHANGELOG_FROM_EVENTS_CTE = """
_ch AS (
  SELECT
    event_id AS seq,
    CASE WHEN event_id % 10 < 7 THEN 'I'
         WHEN event_id % 10 < 9 THEN 'U'
         ELSE 'D' END AS op,
    CASE WHEN event_id % 97 = 13 THEN NULL
         WHEN event_id % 5 = 0 THEN 'c0'
         ELSE 'c' || CAST(user_id % 101 AS VARCHAR) END AS conv_id,
    CASE WHEN event_id % 97 = 41 THEN -1
         ELSE CAST(event_id % 40 AS INTEGER) END AS turn_idx,
    CASE WHEN event_id % 10 >= 9 THEN NULL
         ELSE CASE event_id % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
              WHEN 2 THEN 'tool' ELSE 'system' END END AS role,
    CASE WHEN event_id % 10 >= 9 THEN NULL
         WHEN event_id % 97 = 71 THEN NULL
         ELSE event_type || ' #' || CAST(event_id AS VARCHAR) END AS text,
    CASE WHEN event_id % 10 >= 9 THEN NULL
         WHEN event_id < (SELECT min(event_id) + 3 * (max(event_id) - min(event_id) + 1) // 10
                          FROM events) THEN NULL
         ELSE CASE event_id % 7 WHEN 0 THEN 'search' WHEN 1 THEN 'code'
              WHEN 2 THEN 'browser' ELSE NULL END END AS tool,
    ts,
    'b' || CAST(event_id // 1000 AS VARCHAR) AS batch_id
  FROM events
)
"""

# Validity predicate shared by engine + oracle: a change event is valid iff
# it has a conv_id, a non-negative turn_idx, and (unless a delete) a payload.
VALID_PREDICATE_SQL = (
    "conv_id IS NOT NULL AND turn_idx >= 0 AND (op = 'D' OR text IS NOT NULL)"
)


def derive_changelog_from_events(events: pa.Table) -> pa.Table:
    """Vectorized Python twin of ``CHANGELOG_FROM_EVENTS_CTE``."""
    eid = events.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    uid = events.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    etype = np.asarray(events.column("event_type").to_pylist(), dtype=object)
    # The SQL/Python lockstep holds only for non-negative ids and
    # non-null event types: DuckDB's % keeps the dividend's sign (numpy
    # keeps the divisor's) and SQL NULL || '...' is NULL (Python would
    # render 'None').  Fail loudly rather than derive divergent streams.
    if (eid < 0).any() or (uid < 0).any():
        raise ValueError("derive_changelog_from_events requires non-negative ids")
    if events.column("event_type").null_count:
        raise ValueError("derive_changelog_from_events requires non-null event_type")

    m10 = eid % 10
    m97 = eid % 97
    is_del = m10 >= 9
    op = np.where(m10 < 7, "I", np.where(m10 < 9, "U", "D"))

    conv = np.where(eid % 5 == 0, "c0", np.char.add("c", (uid % 101).astype(str)))
    conv = conv.astype(object)
    conv[m97 == 13] = None

    turn = (eid % 40).astype(np.int32)
    turn[m97 == 41] = -1

    role = ROLES[eid % 4].astype(object)
    role[is_del] = None

    text = np.char.add(np.char.add(etype.astype(str), " #"), eid.astype(str)).astype(object)
    text[is_del] = None
    text[(~is_del) & (m97 == 71)] = None

    lo, hi = int(eid.min()), int(eid.max())
    tool_cutoff = lo + 3 * (hi - lo + 1) // 10
    m7 = eid % 7
    tool = np.where(m7 < 3, TOOLS[np.minimum(m7, 2)], None).astype(object)
    tool[is_del | (eid < tool_cutoff)] = None

    batch_id = np.char.add("b", (eid // 1000).astype(str))

    return pa.Table.from_arrays(
        [
            pa.array(eid, type=pa.int64()),
            pa.array(op),
            pa.array(conv, type=pa.string()),
            pa.array(turn, type=pa.int32()),
            pa.array(role, type=pa.string()),
            pa.array(text, type=pa.string()),
            pa.array(tool, type=pa.string()),
            events.column("ts").cast(pa.timestamp("us")).combine_chunks(),
            pa.array(batch_id),
        ],
        schema=CHANGELOG_SCHEMA,
    )


def write_changelog_from_events(sf_dir: str, out_dir: str, files: int = 4) -> list[str]:
    """Derive the changelog from ``{sf_dir}/events.parquet`` and write it as
    an ordered multi-file log under ``out_dir``.

    The first ~30% of the stream (the pre-``tool_cutoff`` prefix) is
    written WITHOUT the ``tool`` column — physically exercising schema
    evolution, like early producers that predate the column.
    Idempotent: skips work if the output already exists (same derivation
    is deterministic).
    """
    cached = _read_done_marker(out_dir)
    if cached is not None:
        return cached
    os.makedirs(out_dir, exist_ok=True)
    _clear_stale_parquet(out_dir)  # crash-before-marker leftovers
    events = pq.read_table(sf_dir.rstrip("/") + "/events.parquet")
    ch = derive_changelog_from_events(events)
    eid = ch.column("seq").to_numpy()
    lo, hi = int(eid.min()), int(eid.max())
    tool_cutoff = lo + 3 * (hi - lo + 1) // 10
    prefix = ch.filter(pc.less(ch.column("seq"), tool_cutoff)).drop_columns(["tool"])
    rest = ch.filter(pc.greater_equal(ch.column("seq"), tool_cutoff))
    paths = []
    p0 = os.path.join(out_dir, "changelog-00000.parquet")
    pq.write_table(prefix, p0)
    paths.append(p0)
    n = max(1, files - 1)
    step = (rest.num_rows + n - 1) // n
    for i in range(n):
        part = rest.slice(i * step, step)
        if part.num_rows == 0:
            break
        p = os.path.join(out_dir, f"changelog-{i + 1:05d}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    _write_done_marker(out_dir, paths)
    return paths


# ---------------------------------------------------------------------------
# 2. Seeded generator at arbitrary scale (bench / stress tests)
# ---------------------------------------------------------------------------

def generate_changelog(
    n_events: int,
    n_convs: int = 1000,
    max_turns: int = 64,
    hot_frac: float = 0.2,
    invalid_frac: float = 0.01,
    delete_frac: float = 0.1,
    update_frac: float = 0.2,
    seed: int = 42,
) -> pa.Table:
    """Deterministic change stream: one hot conversation takes ``hot_frac``
    of all events (≈10^3× the median, the skew scenario), invalid rows are
    sprinkled at arbitrary positions, and ops are I/U/D mixed.
    """
    if n_convs < 2:
        raise ValueError("n_convs must be >= 2 (conv 0 is the reserved hot conversation)")
    rng = np.random.default_rng(seed)
    seq = np.arange(n_events, dtype=np.int64)

    r_op = rng.random(n_events)
    op = np.where(r_op < delete_frac, "D", np.where(r_op < delete_frac + update_frac, "U", "I"))

    hot = rng.random(n_events) < hot_frac
    conv_num = rng.integers(1, n_convs, size=n_events)
    conv_num[hot] = 0
    conv = np.char.add("conv-", conv_num.astype(str)).astype(object)

    turn = rng.integers(0, max_turns, size=n_events).astype(np.int32)
    # the hot conversation gets a much deeper turn space so its keys are many
    turn[hot] = rng.integers(0, max_turns * 100, size=int(hot.sum())).astype(np.int32)

    role = ROLES[rng.integers(0, 4, size=n_events)].astype(object)
    text = np.char.add(
        np.char.add("turn text ", seq.astype(str)),
        np.char.add(" r", rng.integers(0, 10_000, size=n_events).astype(str)),
    ).astype(object)
    tool = np.where(rng.random(n_events) < 0.3, TOOLS[rng.integers(0, 3, size=n_events)], None).astype(object)

    is_del = op == "D"
    role[is_del] = None
    text[is_del] = None
    tool[is_del] = None

    # invalid rows at arbitrary positions
    r_inv = rng.random(n_events)
    conv[r_inv < invalid_frac / 3] = None
    bad_turn = (r_inv >= invalid_frac / 3) & (r_inv < 2 * invalid_frac / 3)
    turn[bad_turn] = -1
    null_payload = (r_inv >= 2 * invalid_frac / 3) & (r_inv < invalid_frac) & ~is_del
    text[null_payload] = None

    ts = (np.int64(1_700_000_000_000_000) + seq * 1000).view(np.int64)
    batch_id = np.char.add("b", (seq // 10_000).astype(str))

    return pa.Table.from_arrays(
        [
            pa.array(seq, type=pa.int64()),
            pa.array(op.astype(object), type=pa.string()),
            pa.array(conv, type=pa.string()),
            pa.array(turn, type=pa.int32()),
            pa.array(role, type=pa.string()),
            pa.array(text, type=pa.string()),
            pa.array(tool, type=pa.string()),
            pa.array(ts, type=pa.timestamp("us")),
            pa.array(batch_id),
        ],
        schema=CHANGELOG_SCHEMA,
    )


def write_generated_changelog(
    out_dir: str,
    n_events: int,
    files: int = 16,
    tool_absent_frac: float = 0.3,
    **kwargs,
) -> list[str]:
    """Write a generated changelog as an ordered multi-file log; the first
    ``tool_absent_frac`` of files omit the ``tool`` column (schema
    evolution).  Generation is per-file, so peak memory is one file's
    rows (size the ``files`` count so n_events/files stays in the 10^5-
    10^6 range at big n).  Idempotent via a ``_DONE`` marker.
    """
    cached = _read_done_marker(out_dir)
    if cached is not None:
        return cached
    os.makedirs(out_dir, exist_ok=True)
    _clear_stale_parquet(out_dir)  # crash-before-marker leftovers
    seed = kwargs.pop("seed", 42)
    per_file = (n_events + files - 1) // files
    cutoff_files = int(files * tool_absent_frac)
    paths = []
    offset = 0
    for i in range(files):
        n = min(per_file, n_events - offset)
        if n <= 0:
            break
        t = generate_changelog(n, seed=seed + i, **kwargs)
        # shift seq/ts to keep the global order across files
        t = t.set_column(0, "seq", pc.add(t.column("seq"), offset))
        t = t.set_column(
            7, "ts", pc.add(t.column("ts").cast(pa.int64()), offset * 1000).cast(pa.timestamp("us"))
        )
        t = t.set_column(
            8, "batch_id",
            pa.array(np.char.add("b", ((np.arange(n, dtype=np.int64) + offset) // 10_000).astype(str))),
        )
        if i < cutoff_files:
            t = t.drop_columns(["tool"])
        p = os.path.join(out_dir, f"changelog-{i:05d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
        offset += n
    _write_done_marker(out_dir, paths)
    return paths


def export_changelog_csv(parquet_dir: str, out_dir: str) -> list[str]:
    """Re-publish a parquet change log as CSV segments (one per file) —
    the delimited-text ingest surface of the tailer.

    Arrow's CSV writer/reader pair is lossless for the changelog schema
    under the tailer's read conventions: null string → unquoted empty
    field, empty string → quoted ``""`` (so validate's null-payload
    reject survives the format hop), embedded newlines/commas/quotes
    ride inside quoting, timestamps round-trip at microsecond
    precision, and absent columns (schema evolution) stay absent.  A
    test/bench utility: production logs should stay parquet
    (footer-stats offset pruning)."""
    import pyarrow.csv as _pacsv
    import pyarrow.parquet as _pq

    os.makedirs(out_dir, exist_ok=True)
    outs = []
    for f in sorted(os.listdir(parquet_dir)):
        if not f.endswith(".parquet"):
            continue
        t = _pq.read_table(os.path.join(parquet_dir, f))
        p = os.path.join(out_dir, f[: -len(".parquet")] + ".csv")
        _pacsv.write_csv(t, p)
        outs.append(p)
    return outs


def export_changelog_jsonl(parquet_dir: str, out_dir: str) -> list[str]:
    """Re-publish a parquet change log as JSONL segments (one per file,
    ISO-8601 microsecond timestamps, absent columns stay absent keys so
    schema evolution survives the format hop) — the JSON-stream ingest
    surface of the tailer.  A test/bench utility: production logs
    should stay parquet (footer-stats offset pruning)."""
    import pyarrow.parquet as _pq

    os.makedirs(out_dir, exist_ok=True)
    outs = []
    for f in sorted(os.listdir(parquet_dir)):
        if not f.endswith(".parquet"):
            continue
        df = _pq.read_table(os.path.join(parquet_dir, f)).to_pandas()
        p = os.path.join(out_dir, f[: -len(".parquet")] + ".jsonl")
        df.to_json(p, orient="records", lines=True, date_format="iso", date_unit="us")
        outs.append(p)
    return outs
