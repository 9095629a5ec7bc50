"""Envelope parse / validate / route — the NiFi processor logic reborn.

The reference's consumer loop wraps EVERY record in a try/catch: a bad
record is removed and the batch continues, and the checkpoint still
advances past it (``consumer/GetKinesisStream.java:272-278``; proven by
the failure-position test matrix ``consumer/GetKinesisStreamTest.java:
326-481`` and the null-payload IT ``consumer/GetKinesisStreamTestIT.java:
274-321``).  Here that is a single vectorized pass: every row gets a
``reject_reason`` column (NULL = valid); downstream the merge stage
routes non-null rows to the ``rejected`` Parquet side table — the
dataflow analog of NiFi's success/failure relationships
(``producer/PutKinesisStream.java:296,316,321``).

Stateless — runs as plain Ray tasks via ``map_batches(validate_batch,
batch_format='pyarrow')``, zero-copy in, one new column out.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import CHANGELOG_SCHEMA, align_to_schema_lenient

REJECT_NULL_SEQ = "null_seq"
REJECT_NULL_CONV = "null_conv_id"
REJECT_BAD_TURN = "bad_turn_idx"
REJECT_BAD_OP = "bad_op"
REJECT_NULL_PAYLOAD = "null_payload"

_VALID_OPS = pa.array(["I", "U", "D"])


def validate_batch(batch: pa.Table) -> pa.Table:
    """Align to the changelog schema and append ``reject_reason``.

    Order of checks mirrors the oracle (first matching reason wins):
    null conv_id → bad turn_idx → bad op → null payload (non-delete).

    Alignment is LENIENT: an un-castable column (poison data) is nulled
    so the affected rows fall into the reject routing below instead of
    raising on every retry and wedging the stream at this stage.  If the
    damaged column is one the key checks would NOT catch (ts, role,
    tool, batch_id), every row of the batch is rejected explicitly —
    silently applying rows with a destroyed column would be unrecorded
    corruption.
    """
    batch, nulled = align_to_schema_lenient(batch, CHANGELOG_SCHEMA)
    unchecked_damage = [c for c in nulled if c not in ("conv_id", "turn_idx", "op", "text", "seq")]
    if unchecked_damage:
        reason = pa.repeat(pa.scalar(f"uncastable_column:{unchecked_damage[0]}"), batch.num_rows)
        return batch.append_column("reject_reason", reason)
    conv = batch.column("conv_id")
    turn = batch.column("turn_idx")
    op = batch.column("op")
    text = batch.column("text")

    m_null_seq = pc.is_null(batch.column("seq"))
    m_null_conv = pc.is_null(conv)
    m_bad_turn = pc.or_kleene(pc.is_null(turn), pc.fill_null(pc.less(turn, 0), True))
    m_bad_op = pc.invert(pc.fill_null(pc.is_in(op, value_set=_VALID_OPS), False))
    m_null_payload = pc.and_kleene(
        pc.fill_null(pc.not_equal(op, "D"), True), pc.is_null(text)
    )

    # first matching reason wins, innermost-last
    reason = pa.scalar(None, pa.string())
    for mask, label in reversed(
        [
            (m_null_seq, REJECT_NULL_SEQ),
            (m_null_conv, REJECT_NULL_CONV),
            (m_bad_turn, REJECT_BAD_TURN),
            (m_bad_op, REJECT_BAD_OP),
            (m_null_payload, REJECT_NULL_PAYLOAD),
        ]
    ):
        reason = pc.if_else(mask, pa.scalar(label), reason)
    return batch.append_column("reject_reason", reason)


def split_rejects(batch: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(valid rows without the reason column, rejected rows with it)."""
    mask = pc.is_null(batch.column("reject_reason"))
    valid = batch.filter(mask).drop_columns(["reject_reason"])
    rejected = batch.filter(pc.invert(mask))
    return valid, rejected
