"""Regression tests for review findings (round 1 self-review)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from nifi_processors_ray.config import EngineConfig
from nifi_processors_ray.oracle import apply_changelog
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.sources import tailer
from nifi_processors_ray.synth import generate_changelog


def test_stats_free_log_file_gets_exact_bounds(tmp_path):
    """A file written without parquet statistics must not poison head_seq."""
    ch = generate_changelog(500, n_convs=10)
    p = str(tmp_path / "nostats.parquet")
    pq.write_table(ch, p, write_statistics=False)
    infos = tailer.scan_log([p])
    assert infos[0].seq_min == 0 and infos[0].seq_max == 499
    assert tailer.head_seq(infos) == 499


def test_stats_free_replay_terminates(tmp_path):
    ch = generate_changelog(300, n_convs=10)
    log = tmp_path / "log"
    log.mkdir()
    pq.write_table(ch, str(log / "a.parquet"), write_statistics=False)
    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            changelog_paths=(str(log),),
            num_partitions=4,
            salt_factor=2,
            epoch_events=100,
        )
    )
    results = eng.replay(max_epochs=50)
    assert len(results) == 3  # 300 events / 100 per epoch — NOT 50 empty epochs
    assert eng.store.latest().min_watermark == 299


def test_minhash_null_and_empty_text_isolated():
    """Null/empty docs must not borrow the previous doc's tokens."""
    from nifi_processors_ray.ops.dedup import minhash_signatures

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["alpha beta gamma delta", None, "", None]),
        }
    )
    sigs = minhash_signatures(batch)
    rows = sigs.to_pylist()
    # both null docs and the empty doc share the empty-document signature
    assert rows[1]["sig"] == rows[2]["sig"] == rows[3]["sig"]
    # and it differs from a real doc's signature
    assert rows[0]["sig"] != rows[1]["sig"]
    # all-null batch does not crash
    allnull = pa.table(
        {"doc_id": pa.array([9], pa.int64()), "text": pa.array([None], pa.string())}
    )
    assert minhash_signatures(allnull).num_rows == 1


def test_oracle_base_rows_survive_lww():
    base = pa.table(
        {
            "seq": pa.array([1, 2], pa.int64()),
            "conv_id": pa.array(["a", "b"]),
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": pa.array(["user", "user"]),
            "text": pa.array(["base-a", "base-b"]),
            "tool": pa.array([None, None], pa.string()),
            "ts": pa.array([0, 0], pa.timestamp("us")),
        }
    )
    ch = generate_changelog(0, n_convs=2).slice(0, 0)  # empty changelog
    out = apply_changelog(ch, base=base).to_pydict()
    assert out["text"] == ["base-a", "base-b"]  # untouched base keys survive


def test_deadletter_schema_stable_with_files(tmp_path):
    import os

    from nifi_processors_ray.schema import CHANGELOG_SCHEMA
    from nifi_processors_ray.synth import write_generated_changelog

    log = str(tmp_path / "log")
    write_generated_changelog(log, 2000, files=1, n_convs=20)
    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            changelog_paths=(log,),
            num_partitions=4,
            salt_factor=2,
            epoch_events=1000,
        )
    )
    eng.run_epoch()
    man = eng.store.latest()
    victim = min(p for p, fs in man.files.items() if fs)
    with open(os.path.join(eng.cfg.lake_dir, man.files[victim][0]), "wb") as f:
        f.write(b"junk")
    eng.run_epoch()
    cols = set(eng.deadletter().schema().names)
    assert cols == {f.name for f in CHANGELOG_SCHEMA}  # no hive 'epoch' column


def test_log_scan_cache_skips_unchanged_files(tmp_path, monkeypatch):
    from nifi_processors_ray.synth import write_generated_changelog

    log = str(tmp_path / "log")
    write_generated_changelog(log, 1000, files=4, n_convs=10)
    eng = CdcEngine(
        EngineConfig(lake_dir=str(tmp_path / "lake"), changelog_paths=(log,))
    )
    eng.log_infos()
    calls = []
    real = tailer.scan_log
    monkeypatch.setattr(tailer, "scan_log", lambda ps: calls.append(len(ps)) or real(ps))
    eng.log_infos(refresh=True)
    assert calls == [0]  # nothing changed → nothing re-scanned
    # a new file triggers exactly one scan
    ch = generate_changelog(100, n_convs=10, seed=5)
    ch = ch.set_column(0, "seq", pa.array(np.asarray(ch.column("seq")) + 1000))
    pq.write_table(ch, f"{log}/changelog-99999.parquet")
    eng.log_infos(refresh=True)
    assert calls == [0, 1]
