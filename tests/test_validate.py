"""The failure-position matrix reborn: bad rows at ANY position are
routed aside, the rest apply (consumer/GetKinesisStreamTest.java:326-481,
null-payload IT at GetKinesisStreamTestIT.java:274-321)."""

import pyarrow as pa
import pytest

from nifi_processors_ray.schema import CHANGELOG_SCHEMA
from nifi_processors_ray.stages.validate import (
    REJECT_BAD_OP,
    REJECT_BAD_TURN,
    REJECT_NULL_CONV,
    REJECT_NULL_PAYLOAD,
    split_rejects,
    validate_batch,
)


def make_batch(rows):
    cols = {f.name: [r.get(f.name) for r in rows] for f in CHANGELOG_SCHEMA}
    return pa.Table.from_pydict(cols, schema=CHANGELOG_SCHEMA)


GOOD = dict(seq=1, op="I", conv_id="c1", turn_idx=0, role="user", text="hi", ts=0, batch_id="b0")


def _bad(**over):
    d = dict(GOOD)
    d.update(over)
    return d


@pytest.mark.parametrize("position", [0, 1, 2])
@pytest.mark.parametrize(
    "bad,reason",
    [
        (_bad(conv_id=None), REJECT_NULL_CONV),
        (_bad(turn_idx=-1), REJECT_BAD_TURN),
        (_bad(turn_idx=None), REJECT_BAD_TURN),
        (_bad(op="X"), REJECT_BAD_OP),
        (_bad(op=None), REJECT_BAD_OP),
        (_bad(text=None), REJECT_NULL_PAYLOAD),
    ],
)
def test_bad_row_any_position(position, bad, reason):
    rows = [dict(GOOD, seq=i) for i in range(3)]
    rows[position] = dict(bad, seq=position)
    out = validate_batch(make_batch(rows))
    valid, rejected = split_rejects(out)
    assert valid.num_rows == 2
    assert rejected.num_rows == 1
    assert rejected.column("reject_reason")[0].as_py() == reason
    assert rejected.column("seq")[0].as_py() == position


def test_delete_with_null_payload_is_valid():
    rows = [_bad(op="D", role=None, text=None, tool=None)]
    valid, rejected = split_rejects(validate_batch(make_batch(rows)))
    assert valid.num_rows == 1 and rejected.num_rows == 0


def test_missing_tool_column_aligned():
    t = make_batch([GOOD]).drop_columns(["tool"])
    out = validate_batch(t)
    assert "tool" in out.column_names
    assert out.column("tool")[0].as_py() is None


def test_all_rows_bad_batch_survives():
    rows = [_bad(conv_id=None, seq=i) for i in range(5)]
    valid, rejected = split_rejects(validate_batch(make_batch(rows)))
    assert valid.num_rows == 0 and rejected.num_rows == 5
