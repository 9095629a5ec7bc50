"""Property-based check: the pure-Arrow LWW kernel == the polars oracle.

The merge kernel (`stages.merge.lww_merge`) and the naive applier
(`oracle.apply_changelog`) are independent implementations of the same
semantics; hypothesis drives randomized change streams (duplicate keys,
out-of-order seq, deletes, prior state, null tools) through both.
"""

import hypothesis.strategies as st
import numpy as np
import pyarrow as pa
from hypothesis import given, settings

from nifi_processors_ray.oracle import apply_changelog
from nifi_processors_ray.schema import CHANGELOG_SCHEMA, align_to_schema
from nifi_processors_ray.stages.merge import TRANSCRIPT_COLS, lww_merge

event = st.fixed_dictionaries(
    {
        "op": st.sampled_from(["I", "U", "D"]),
        "conv_id": st.sampled_from(["c0", "c1", "c2"]),
        "turn_idx": st.integers(0, 3),
        "role": st.sampled_from(["user", "assistant"]),
        "text": st.text(alphabet="abxy ", min_size=0, max_size=6),
        "tool": st.sampled_from([None, "search", "code"]),
    }
)


def _to_changelog(events: list[dict]) -> pa.Table:
    n = len(events)
    cols = {
        "seq": pa.array(np.arange(n, dtype=np.int64)),
        "op": pa.array([e["op"] for e in events]),
        "conv_id": pa.array([e["conv_id"] for e in events]),
        "turn_idx": pa.array([e["turn_idx"] for e in events], pa.int32()),
        "role": pa.array(
            [None if e["op"] == "D" else e["role"] for e in events], pa.string()
        ),
        "text": pa.array(
            [None if e["op"] == "D" else e["text"] for e in events], pa.string()
        ),
        "tool": pa.array(
            [None if e["op"] == "D" else e["tool"] for e in events], pa.string()
        ),
        "ts": pa.array(
            np.arange(n, dtype=np.int64) * 1000, pa.timestamp("us")
        ),
        "batch_id": pa.array(["b0"] * n),
    }
    return pa.Table.from_pydict(cols, schema=CHANGELOG_SCHEMA)


@settings(max_examples=200, deadline=None)
@given(st.lists(event, min_size=0, max_size=40), st.permutations(range(40)))
def test_lww_merge_equals_oracle(events, perm):
    ch = _to_changelog(events)
    # replay in a scrambled arrival order — LWW must still resolve by seq
    order = [i for i in perm if i < ch.num_rows]
    scrambled = ch.take(pa.array(order, pa.int64())) if order else ch
    got = lww_merge(None, scrambled).select(TRANSCRIPT_COLS)
    want = align_to_schema(apply_changelog(ch), got.schema)
    assert got.equals(want), f"\n{got.to_pydict()}\nvs\n{want.to_pydict()}"


@settings(max_examples=50, deadline=None)
@given(st.lists(event, min_size=1, max_size=20), st.lists(event, min_size=1, max_size=20))
def test_lww_merge_incremental_equals_one_shot(first, second):
    """Applying the log in two epochs == applying it at once."""
    ch1 = _to_changelog(first)
    ch2 = _to_changelog(second)
    # shift second epoch's seqs after the first
    ch2 = ch2.set_column(
        0, "seq", pa.array(np.asarray(ch2.column("seq")) + ch1.num_rows)
    )
    state1 = lww_merge(None, ch1)
    two_step = lww_merge(state1, ch2).select(TRANSCRIPT_COLS)
    full = pa.concat_tables([ch1, ch2])
    one_shot = lww_merge(None, full).select(TRANSCRIPT_COLS)
    assert two_step.equals(one_shot)
