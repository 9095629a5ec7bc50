"""Naive single-process CDC applier — the golden reference for tests.

Semantics (the engine must match this row-for-row on the per-turn
text-equality invariant under stable ``(conv_id, turn_idx)`` ordering):

1. Drop invalid events (null ``conv_id``, negative/null ``turn_idx``,
   null payload on a non-delete) — they go to the rejected table, they
   never apply, and the watermark advances past them (the reference's
   skip-on-error, ``consumer/GetKinesisStream.java:272-278``).
2. Last-writer-wins per ``(conv_id, turn_idx)`` by highest ``seq``
   (the per-shard sequence-number order the reference's
   checkpoint-at-last semantics rely on,
   ``consumer/GetKinesisStream.java:283-288``).
3. If the winning event is a delete, the key is gone (tombstone,
   compacted away at commit).
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa

from .schema import CHANGELOG_SCHEMA, align_to_schema


def split_valid(changelog: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(valid, rejected-with-reason) — single-process twin of stages.validate."""
    df = pl.from_arrow(align_to_schema(changelog, CHANGELOG_SCHEMA))
    reason = (
        pl.when(pl.col("seq").is_null())
        .then(pl.lit("null_seq"))
        .when(pl.col("conv_id").is_null())
        .then(pl.lit("null_conv_id"))
        .when(pl.col("turn_idx").is_null() | (pl.col("turn_idx") < 0))
        .then(pl.lit("bad_turn_idx"))
        # fill_null(False): a NULL op must read as "not a valid op" →
        # bad_op, matching stages/validate.py (a bare Kleene null here
        # would skip the branch and classify the row as valid)
        .when(~pl.col("op").is_in(["I", "U", "D"]).fill_null(False))
        .then(pl.lit("bad_op"))
        .when((pl.col("op") != "D") & pl.col("text").is_null())
        .then(pl.lit("null_payload"))
        .otherwise(None)
    )
    df = df.with_columns(reason.alias("reject_reason"))
    valid = df.filter(pl.col("reject_reason").is_null()).drop("reject_reason")
    rejected = df.filter(pl.col("reject_reason").is_not_null())
    return valid.to_arrow(), rejected.to_arrow()


def apply_changelog(changelog: pa.Table, base: pa.Table | None = None) -> pa.Table:
    """Replay the change stream over an optional base table → final state."""
    valid, _ = split_valid(changelog)
    df = pl.from_arrow(valid)
    if base is not None:
        # base rows are already-applied upserts: op must read as 'I', not
        # the null that align_to_schema fills (a null op would be dropped
        # by the op != 'D' filter whenever a base row wins LWW)
        base_df = pl.from_arrow(align_to_schema(base, CHANGELOG_SCHEMA)).with_columns(
            pl.col("op").fill_null("I")
        )
        df = pl.concat([base_df, df], how="vertical")
    final = (
        df.sort("seq")
        .group_by(["conv_id", "turn_idx"], maintain_order=False)
        .last()
        .filter(pl.col("op") != "D")
        .select(["conv_id", "turn_idx", "role", "text", "tool", "ts"])
        .sort(["conv_id", "turn_idx"])
    )
    return final.to_arrow()
