"""Resumable partitioned-export sink (sinks.py)."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from nifi_processors_ray.sinks import (
    read_partitioned_parquet,
    write_partitioned_parquet,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    return ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])


def test_export_roundtrip_and_resume(tmp_path):
    out = str(tmp_path / "export")
    res = write_partitioned_parquet(_docs(), out, key="doc_id", num_partitions=8, sort_key="doc_id")
    assert res["skipped"] == 0 and res["written"] >= 1
    total = _docs().count()
    assert res["rows_written"] == total

    back = read_partitioned_parquet(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = _docs().to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back.equals(orig)

    # fully-done export: everything skipped, nothing rewritten
    res2 = write_partitioned_parquet(_docs(), out, key="doc_id", num_partitions=8)
    assert res2 == {"written": 0, "skipped": 8, "rows_written": 0}


def test_export_resume_rewrites_only_missing(tmp_path):
    out = str(tmp_path / "export")
    write_partitioned_parquet(_docs(), out, key="doc_id", num_partitions=8, sort_key="doc_id")
    parts = sorted(p for p in os.listdir(out) if p.startswith("part="))
    # simulate a crash: two partitions lost their marker (one also its data)
    victim_a, victim_b = parts[0], parts[-1]
    os.remove(os.path.join(out, victim_a, "_DONE"))
    shutil.rmtree(os.path.join(out, victim_b))
    survivors = {
        p: os.path.getmtime(os.path.join(out, p, "data.parquet"))
        for p in parts
        if p not in (victim_a, victim_b)
    }

    res = write_partitioned_parquet(_docs(), out, key="doc_id", num_partitions=8, sort_key="doc_id")
    assert res["written"] == 2 and res["skipped"] == len(parts) - 2

    # survivors untouched (resume skipped them entirely)
    for p, mtime in survivors.items():
        assert os.path.getmtime(os.path.join(out, p, "data.parquet")) == mtime

    # recovered content identical to the original export
    back = read_partitioned_parquet(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = _docs().to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back.equals(orig)


def test_read_incomplete_export_raises(tmp_path):
    out = str(tmp_path / "export")
    os.makedirs(out)
    with pytest.raises(FileNotFoundError):
        read_partitioned_parquet(out)


def test_read_jsonl_matches_parquet_source(tmp_path):
    """The JSONL source yields the same rows/types as the parquet source,
    so every documents-table operator runs unchanged on JSONL corpora."""
    import json

    import pyarrow as pa

    from nifi_processors_ray.sources.reader import read_jsonl
    from nifi_processors_ray.sources.reader import read_parquet as read_parquet_clean

    cols = ["doc_id", "text", "n_chars"]
    ref = read_parquet_clean(f"{SF_DIR}/documents.parquet", columns=cols).to_pandas()

    jl = tmp_path / "docs.jsonl"
    with open(jl, "w") as f:
        for r in ref.to_dict(orient="records"):
            f.write(json.dumps(r) + "\n")

    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()), ("n_chars", pa.int64())])
    got = read_jsonl(str(jl), columns=cols, schema=schema).to_pandas()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = ref.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)

    # and an operator consumes it unchanged
    from nifi_processors_ray.ops.text import token_counts_batch

    out = token_counts_batch(pa.Table.from_pandas(a, preserve_index=False))
    assert out.num_rows == len(a)


def test_read_csv_matches_parquet_source(tmp_path):
    import csv as _csv

    import pyarrow as pa

    from nifi_processors_ray.sources.reader import read_csv
    from nifi_processors_ray.sources.reader import read_parquet as read_parquet_clean

    cols = ["doc_id", "n_chars", "lang"]
    ref = read_parquet_clean(f"{SF_DIR}/documents.parquet", columns=cols).to_pandas()
    cf = tmp_path / "docs.csv"
    ref.to_csv(cf, index=False, quoting=_csv.QUOTE_NONNUMERIC)
    schema = pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64()), ("lang", pa.string())])
    got = read_csv(str(cf), columns=cols, schema=schema).to_pandas()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = ref.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
