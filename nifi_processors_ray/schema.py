"""Frozen Arrow schemas for the engine's tables.

The reference's data model is an opaque byte payload plus a flat
string attribute map (NiFi FlowFile; see
``consumer/GetKinesisStream.java:256-262``).  We replace it with typed
Arrow columns: the payload is the transcript turn itself, the envelope
attributes become first-class columns (the Arrow analog of the six
consumer attributes written at ``consumer/GetKinesisStream.java:307-322``).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Transcript row — the lake table payload (input_hint shape, authoritative).
# Primary key: (conv_id, turn_idx).
# ---------------------------------------------------------------------------
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),  # schema-evolution column: absent in early events
        ("ts", pa.timestamp("us")),
    ]
)

# ---------------------------------------------------------------------------
# Change event — one row of the ordered change log.  The Arrow analog of a
# Kinesis ``Record`` (data / partitionKey / sequenceNumber /
# approximateArrivalTimestamp, read at ``consumer/GetKinesisStream.java:
# 256,312-317``) wrapped around a transcript row.
# ---------------------------------------------------------------------------
CHANGELOG_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),       # global total order; LWW tiebreaker + watermark unit
        ("op", pa.string()),       # 'I' | 'U' | 'D'
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("batch_id", pa.string()),  # idempotence key for exactly-once replay
    ]
)

# The changelog columns that may legitimately be NULL on a delete event.
DELETE_NULLABLE = ("role", "text", "tool")

# ---------------------------------------------------------------------------
# Rejected side table — changelog columns + reason.  The analog of the
# reference's per-record skip-on-error (``consumer/GetKinesisStream.java:
# 272-278``): a bad record never fails the batch, it is routed aside.
# ---------------------------------------------------------------------------
REJECTED_SCHEMA = pa.schema(
    list(CHANGELOG_SCHEMA) + [pa.field("reject_reason", pa.string())]
)

# ---------------------------------------------------------------------------
# Lineage — per-applied-batch provenance, the analog of the producer's
# per-attempt result attributes (``producer/PutKinesisStream.java:343-364``).
# ---------------------------------------------------------------------------
LINEAGE_SCHEMA = pa.schema(
    [
        ("partition", pa.int32()),
        ("batch_id", pa.string()),
        ("seq_lo", pa.int64()),
        ("seq_hi", pa.int64()),
        ("n_applied", pa.int64()),
        ("n_rejected", pa.int64()),
        ("output_files", pa.list_(pa.string())),
        ("attempt", pa.int32()),
        ("commit_epoch", pa.int64()),
        ("wall_ms", pa.int64()),
        # non-null when the partition's batch dead-lettered instead of
        # applying (the producer's per-attempt error-message attribute,
        # ``producer/PutKinesisStream.java:352-360``)
        ("error", pa.string()),
        # how output_files joins the partition's live set: 'replace'
        # (cow rewrite / mor compaction fold) or 'append' (mor delta)
        ("file_mode", pa.string()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def align_to_schema(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project/cast ``table`` onto ``schema``: add missing columns as nulls,
    drop extras, cast mismatched types (safe), order columns per schema.

    This is the engine's Arrow schema-unification primitive, used by both
    the tailer (old changelog files lack the ``tool`` column) and the merge
    stage (prior lake files may predate a widened/added column).
    """
    arrays = []
    for field in schema:
        if field.name in table.column_names:
            col = table.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            arrays.append(col)
        else:
            arrays.append(pa.nulls(table.num_rows, type=field.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def unify_schemas(*schemas: pa.Schema) -> pa.Schema:
    """Unify schemas with type widening (promote_options='permissive')."""
    return pa.unify_schemas(list(schemas), promote_options="permissive")


def align_to_schema_lenient(
    table: pa.Table, schema: pa.Schema
) -> tuple[pa.Table, list[str]]:
    """Like :func:`align_to_schema`, but a column that cannot be safely
    cast becomes all-null instead of raising; returns ``(table,
    nulled_columns)`` so the caller can route the damage.

    Used by the validate stage so deterministic poison data (e.g. a
    drifted file whose int64 turn_idx overflows int32) degrades into
    per-row rejects rather than wedging the stream.  Columns merely
    ABSENT from the input (schema evolution) are added as nulls but NOT
    reported — only cast failures are.
    """
    arrays = []
    nulled: list[str] = []
    for field in schema:
        if field.name in table.column_names:
            col = table.column(field.name)
            if col.type != field.type:
                try:
                    col = col.cast(field.type)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                    col = pa.nulls(table.num_rows, type=field.type)
                    nulled.append(field.name)
            arrays.append(col)
        else:
            arrays.append(pa.nulls(table.num_rows, type=field.type))
    return pa.Table.from_arrays(arrays, schema=schema), nulled
