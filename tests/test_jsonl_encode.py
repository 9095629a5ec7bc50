"""Vectorized Arrow->JSONL encoder == json.dumps(row), byte for byte."""

import datetime
import json

import pyarrow as pa

from nifi_processors_ray.functions.jsonl import encode_jsonl


def test_encode_jsonl_matches_json_dumps():
    tbl = pa.table(
        {
            "conv_id": pa.array(["c1", None, 'we"ird\\x', "tab\there\nnl", ""], pa.string()),
            "turn_idx": pa.array([0, 5, None, 7, -3], pa.int32()),
            "seq": pa.array([10, 11, 12, None, 2**53 + 1], pa.int64()),
            "ok": pa.array([True, False, None, True, False]),
            "ts": pa.array(
                [
                    datetime.datetime(2023, 11, 14, 12, 0, 0),  # .000000 dropped
                    datetime.datetime(2023, 11, 14, 12, 0, 0, 789000),
                    None,
                    datetime.datetime(2023, 1, 1, 0, 0, 0, 5),
                    datetime.datetime(1999, 12, 31, 23, 59, 59, 999999),
                ],
                pa.timestamp("us"),
            ),
        }
    )
    lines = encode_jsonl(tbl).to_pylist()
    for i, line in enumerate(lines):
        row = {c: tbl.column(c)[i].as_py() for c in tbl.column_names}
        row["ts"] = None if row["ts"] is None else str(row["ts"])
        assert line == json.dumps(row)
        assert json.loads(line) == json.loads(json.dumps(row))


def test_encode_jsonl_control_chars_valid_json():
    """All 32 C0 control chars must be escaped (json.dumps parity) —
    a raw \\x1b in the output is invalid JSON for every consumer."""
    texts = ["esc\x1bchar", "nul\x00byte", "vt\x0b", "".join(map(chr, range(0x20))), "plain"]
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    lines = encode_jsonl(tbl).to_pylist()
    for text, line in zip(texts, lines):
        assert line == json.dumps({"text": text})
        assert json.loads(line) == {"text": text}


def test_encode_jsonl_timestamp_units():
    """Non-us units normalize exactly; tz-aware and lossy ns fail loud."""
    import pytest

    dt = datetime.datetime(2023, 11, 14, 12, 0, 0)
    for unit in ("s", "ms", "us"):
        tbl = pa.table({"ts": pa.array([dt], pa.timestamp(unit))})
        assert encode_jsonl(tbl).to_pylist() == [json.dumps({"ts": str(dt)})]
    ns_ok = pa.table({"ts": pa.array([dt], pa.timestamp("ns"))})
    assert encode_jsonl(ns_ok).to_pylist() == [json.dumps({"ts": str(dt)})]
    ns_lossy = pa.table({"ts": pa.array([1_700_000_000_000_000_123], pa.timestamp("ns"))})
    with pytest.raises(pa.ArrowInvalid):
        encode_jsonl(ns_lossy)
    aware = pa.table({"ts": pa.array([dt], pa.timestamp("us", tz="UTC"))})
    with pytest.raises(TypeError, match="tz-aware"):
        encode_jsonl(aware)


def test_encode_jsonl_empty_and_all_null():
    empty = pa.table({"a": pa.array([], pa.string())})
    assert encode_jsonl(empty).to_pylist() == []
    nulls = pa.table({"a": pa.array([None, None], pa.string())})
    assert encode_jsonl(nulls).to_pylist() == ['{"a": null}'] * 2


def test_no_pandas_on_source_paths():
    """pandas is banned from sources/ (the last data-path conversion
    was the fixture exporter — round-3 verdict item #7)."""
    import pathlib

    import nifi_processors_ray.sources as sources_pkg

    src_dir = pathlib.Path(sources_pkg.__file__).parent
    for f in src_dir.glob("*.py"):
        text = f.read_text()
        assert "import pandas" not in text and "to_pandas" not in text, f.name
