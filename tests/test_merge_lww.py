"""LWW merge semantics (pure function, no Ray)."""

import pyarrow as pa

from nifi_processors_ray.schema import CHANGELOG_SCHEMA
from nifi_processors_ray.stages.merge import LAKE_SCHEMA, lww_merge


def ch(rows):
    cols = {f.name: [r.get(f.name) for r in rows] for f in CHANGELOG_SCHEMA}
    return pa.Table.from_pydict(cols, schema=CHANGELOG_SCHEMA)


def lake(rows):
    cols = {f.name: [r.get(f.name) for r in rows] for f in LAKE_SCHEMA}
    return pa.Table.from_pydict(cols, schema=LAKE_SCHEMA)


def test_insert_then_update_keeps_highest_seq():
    out = lww_merge(None, ch([
        dict(seq=1, op="I", conv_id="c", turn_idx=0, role="user", text="v1"),
        dict(seq=5, op="U", conv_id="c", turn_idx=0, role="user", text="v2"),
    ]))
    assert out.num_rows == 1
    assert out.column("text")[0].as_py() == "v2"
    assert out.column("seq")[0].as_py() == 5


def test_out_of_arrival_order_applies_by_seq():
    # arrival order v2 before v1 — seq order must win
    out = lww_merge(None, ch([
        dict(seq=5, op="U", conv_id="c", turn_idx=0, role="user", text="v2"),
        dict(seq=1, op="I", conv_id="c", turn_idx=0, role="user", text="v1"),
    ]))
    assert out.column("text")[0].as_py() == "v2"


def test_delete_tombstone_compacts():
    out = lww_merge(None, ch([
        dict(seq=1, op="I", conv_id="c", turn_idx=0, role="user", text="v1"),
        dict(seq=2, op="D", conv_id="c", turn_idx=0),
    ]))
    assert out.num_rows == 0


def test_delete_then_reinsert():
    out = lww_merge(None, ch([
        dict(seq=1, op="I", conv_id="c", turn_idx=0, role="user", text="v1"),
        dict(seq=2, op="D", conv_id="c", turn_idx=0),
        dict(seq=3, op="I", conv_id="c", turn_idx=0, role="user", text="v3"),
    ]))
    assert out.num_rows == 1 and out.column("text")[0].as_py() == "v3"


def test_prior_state_merges_and_loses_to_newer():
    prior = lake([dict(conv_id="c", turn_idx=0, role="user", text="old", seq=3)])
    out = lww_merge(prior, ch([
        dict(seq=2, op="U", conv_id="c", turn_idx=0, role="user", text="stale"),
        dict(seq=9, op="U", conv_id="c", turn_idx=1, role="user", text="new"),
    ]))
    d = {(r["conv_id"], r["turn_idx"]): r["text"] for r in out.to_pylist()}
    # seq=2 < prior seq=3 → prior text survives; turn 1 inserted
    assert d[("c", 0)] == "old" and d[("c", 1)] == "new"


def test_schema_evolution_prior_without_tool():
    prior = lake([dict(conv_id="c", turn_idx=0, role="user", text="old", seq=1)]).drop_columns(["tool"])
    out = lww_merge(prior, ch([dict(seq=5, op="I", conv_id="c", turn_idx=1, role="tool",
                                    text="x", tool="search")]))
    assert out.schema.equals(LAKE_SCHEMA)
    d = {r["turn_idx"]: r["tool"] for r in out.to_pylist()}
    assert d[0] is None and d[1] == "search"


def test_output_sorted_by_key():
    out = lww_merge(None, ch([
        dict(seq=1, op="I", conv_id="b", turn_idx=1, role="u", text="x"),
        dict(seq=2, op="I", conv_id="a", turn_idx=2, role="u", text="y"),
        dict(seq=3, op="I", conv_id="a", turn_idx=0, role="u", text="z"),
    ]))
    keys = [(r["conv_id"], r["turn_idx"]) for r in out.to_pylist()]
    assert keys == sorted(keys)
