"""Regression tests for round-2 review findings (VERDICT r1 / ADVICE r1)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_simhash_null_and_empty_text_isolated():
    """ADVICE r1 (high): a doc immediately preceding a null-text doc must
    keep its full signature — the old reduceat guard collapsed it to its
    first token, so identical docs straddling a null failed to pair."""
    from nifi_processors_ray.ops.dedup import simhash_signatures

    doc = "alpha beta gamma delta epsilon"
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([doc, None, doc]),
        }
    )
    rows = simhash_signatures(batch).to_pylist()
    # identical docs → identical simhash regardless of batch composition
    assert rows[0]["simhash"] == rows[2]["simhash"]

    # signature must equal the one computed with NO null neighbors
    solo = simhash_signatures(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array([doc])})
    ).to_pylist()
    assert rows[0]["simhash"] == solo[0]["simhash"]

    # null and empty docs share the documented simhash-0 contract
    batch2 = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([None, "", None]),
        }
    )
    sigs2 = simhash_signatures(batch2).to_pylist()
    assert [r["simhash"] for r in sigs2] == [0, 0, 0]

    # all-null and fully empty batches don't crash
    assert (
        simhash_signatures(
            pa.table({"doc_id": pa.array([9], pa.int64()), "text": pa.array([None], pa.string())})
        ).num_rows
        == 1
    )
    assert (
        simhash_signatures(
            pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
        ).num_rows
        == 0
    )


def test_simhash_pairs_survive_null_neighbor(ray_session):
    """End-to-end: identical docs separated by a null doc still pair."""
    import ray.data

    from nifi_processors_ray.ops.dedup import simhash_dup_pairs

    doc = "alpha beta gamma delta epsilon zeta eta theta"
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([doc, None, doc]),
        }
    )
    pairs = simhash_dup_pairs(ray.data.from_arrow(t)).to_pandas()
    assert {(0, 2)} <= set(zip(pairs["doc_a"], pairs["doc_b"]))
