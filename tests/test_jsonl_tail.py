"""JSONL change-stream ingest surface: the tailer consumes JSON-lines
segments (the reference's JSON stream payloads) with the same window,
validation, schema-evolution and convergence semantics as parquet."""

import os

import pytest

from nifi_processors_ray.config import EngineConfig
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.synth import (
    export_changelog_jsonl,
    write_changelog_from_events,
)

SF_DIR = "/root/testdata/sf0.001"


def _engine(tmp_path, name, log_dirs):
    return CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / name),
            changelog_paths=tuple(log_dirs),
            num_partitions=8,
            salt_factor=2,
            epoch_events=100_000,
        )
    )


@pytest.fixture(scope="module")
def logs(tmp_path_factory):
    base = tmp_path_factory.mktemp("jsonl_logs")
    pq_dir = str(base / "pq")
    write_changelog_from_events(SF_DIR, pq_dir, files=4)
    js_dir = str(base / "js")
    export_changelog_jsonl(pq_dir, js_dir)
    return pq_dir, js_dir


def test_jsonl_replay_matches_parquet_replay(ray_session, tmp_path, logs):
    pq_dir, js_dir = logs
    a = _engine(tmp_path, "lake_pq", [pq_dir])
    b = _engine(tmp_path, "lake_js", [js_dir])
    a.replay()
    b.replay()
    fa = a.final_state(sort=True).to_pandas().reset_index(drop=True)
    fb = b.final_state(sort=True).to_pandas().reset_index(drop=True)
    assert fa.equals(fb), "JSONL replay diverged from parquet replay"
    ra = a.rejected().to_pandas().sort_values("seq").reset_index(drop=True)
    rb = b.rejected().to_pandas().sort_values("seq").reset_index(drop=True)
    assert ra.equals(rb), "JSONL reject routing diverged"


def test_mixed_format_log_replays(ray_session, tmp_path, logs):
    """Half the segments parquet, half JSONL, one log directory — the
    union path and the per-format window filters must agree."""
    import shutil

    pq_dir, js_dir = logs
    mixed = tmp_path / "mixed"
    mixed.mkdir()
    pq_files = sorted(f for f in os.listdir(pq_dir) if f.endswith(".parquet"))
    js_files = sorted(f for f in os.listdir(js_dir) if f.endswith(".jsonl"))
    # even-indexed segments as parquet, odd as jsonl (no seq overlap)
    for i, f in enumerate(pq_files):
        if i % 2 == 0:
            shutil.copy(os.path.join(pq_dir, f), mixed / f)
    for i, f in enumerate(js_files):
        if i % 2 == 1:
            shutil.copy(os.path.join(js_dir, f), mixed / f)

    ref = _engine(tmp_path, "lake_ref", [pq_dir])
    mix = _engine(tmp_path, "lake_mix", [str(mixed)])
    ref.replay()
    mix.replay()
    fr = ref.final_state(sort=True).to_pandas().reset_index(drop=True)
    fm = mix.final_state(sort=True).to_pandas().reset_index(drop=True)
    assert fr.equals(fm), "mixed-format replay diverged"


def test_jsonl_schema_evolution_preserved(logs):
    """Early segments exported from tool-less parquet files must not
    grow a tool key (absent key, not null value)."""
    import json

    pq_dir, js_dir = logs
    first = sorted(f for f in os.listdir(js_dir) if f.endswith(".jsonl"))[0]
    with open(os.path.join(js_dir, first)) as f:
        row = json.loads(f.readline())
    assert "seq" in row and "conv_id" in row


def test_jsonl_null_seq_rows_rejected_not_lost(ray_session, tmp_path):
    """A JSONL record with a null seq surfaces to the reject route
    exactly once on the initial window — same contract as parquet/CSV
    (the text-format window filter's TRIM_HORIZON null-seq branch)."""
    from nifi_processors_ray.synth import generate_changelog

    ch = generate_changelog(200, n_convs=10, invalid_frac=0.0)
    seqs = ch.column("seq").to_pylist()
    seqs[5] = None
    import pyarrow as pa

    ch = ch.set_column(0, "seq", pa.array(seqs, pa.int64()))
    log = tmp_path / "log"
    log.mkdir()
    # hand-encode: pandas to_json float-coerces a nullable int column
    # ("seq":0.0), which the tailer's explicit int64 schema refuses —
    # a real producer writes integer (or null) seq
    import json

    with open(str(log / "changelog-0.jsonl"), "w") as f:
        for row in ch.to_pylist():
            row["ts"] = row["ts"].isoformat() if row["ts"] is not None else None
            f.write(json.dumps(row) + "\n")
    eng = _engine(tmp_path, "lake", [str(log)])
    eng.replay()
    rej = eng.rejected().to_pandas()
    assert (rej["reject_reason"] == "null_seq").sum() == 1
