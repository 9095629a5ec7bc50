"""Regression tests for the third review batch (core hardening)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nifi_processors_ray.config import EngineConfig
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.sources import tailer
from nifi_processors_ray.stages.validate import validate_batch
from nifi_processors_ray.synth import generate_changelog, write_generated_changelog


def _engine(tmp_path, **over):
    log = str(tmp_path / "log")
    if not os.path.exists(log):
        write_generated_changelog(log, 1000, files=1, n_convs=10)
    kwargs = dict(
        lake_dir=str(tmp_path / "lake"),
        changelog_paths=(log,),
        num_partitions=4,
        salt_factor=2,
    )
    kwargs.update(over)
    return CdcEngine(EngineConfig(**kwargs))


def test_partial_parquet_file_is_skipped_not_fatal(tmp_path):
    log = tmp_path / "log"
    log.mkdir()
    pq.write_table(generate_changelog(500, n_convs=10), str(log / "a.parquet"))
    # a producer mid-write: file exists, footer incomplete
    with open(log / "b.parquet", "wb") as f:
        f.write(b"PAR1\x00\x00partial")
    infos = tailer.scan_log(tailer.discover_log_files([str(log)]))
    assert [os.path.basename(i.path) for i in infos] == ["a.parquet"]


def test_missing_seq_column_raises_clear_error(tmp_path):
    p = str(tmp_path / "noseq.parquet")
    pq.write_table(pa.table({"x": pa.array([1, 2])}), p)
    with pytest.raises(ValueError, match="no 'seq' column"):
        tailer.scan_log([p])


def test_null_seq_rows_rejected_not_lost(tmp_path):
    ch = generate_changelog(200, n_convs=10, invalid_frac=0.0)
    seqs = ch.column("seq").to_pylist()
    seqs[5] = None  # one corrupt row
    ch = ch.set_column(0, "seq", pa.array(seqs, pa.int64()))
    log = tmp_path / "log"
    log.mkdir()
    pq.write_table(ch, str(log / "a.parquet"))
    eng = _engine(tmp_path)
    eng.replay()
    rej = eng.rejected().to_pandas()
    assert (rej["reject_reason"] == "null_seq").sum() == 1
    # accounted exactly once even across a re-replay
    eng2 = _engine(tmp_path)
    eng2.replay()
    assert (eng2.rejected().to_pandas()["reject_reason"] == "null_seq").sum() == 1


def test_validate_lenient_on_uncastable_column():
    # int64 turn_idx with a value that overflows int32 → rows rejected,
    # batch survives (no raise)
    ch = generate_changelog(10, n_convs=3, invalid_frac=0.0)
    big = ch.set_column(
        3, "turn_idx", pa.array([2**40] * 10, pa.int64())
    )
    out = validate_batch(big)
    reasons = out.column("reject_reason").to_pylist()
    assert all(r == "bad_turn_idx" for r in reasons)


def test_writer_lock_excludes_second_writer(tmp_path):
    eng = _engine(tmp_path)
    with eng.store.writer_lock():
        with pytest.raises(RuntimeError, match="another writer"):
            with eng.store.writer_lock():
                pass
    # released → reacquirable, and an epoch runs normally
    assert eng.run_epoch() is not None


def test_manifest_fallback_when_current_dangles(tmp_path):
    eng = _engine(tmp_path)
    eng.replay()
    man = eng.store.latest()
    # simulate the power-crash edge: CURRENT names a missing snapshot
    with open(os.path.join(eng.cfg.manifest_dir, "CURRENT"), "w") as f:
        f.write("manifest-9999999999.json")
    recovered = eng.store.latest()
    assert recovered is not None
    assert recovered.epoch == man.epoch  # newest EXISTING snapshot wins


def test_lineage_bounds_cover_applied_rows_only(tmp_path):
    eng = _engine(tmp_path)
    eng.replay()
    lineage = eng.lineage().to_pandas()
    applied = lineage[lineage["n_applied"] > 0]
    assert applied["seq_lo"].notna().all() and applied["seq_hi"].notna().all()
    none_applied = lineage[lineage["n_applied"] == 0]
    if len(none_applied):
        assert none_applied["seq_lo"].isna().all()


def test_uncastable_nonkey_column_rejects_batch_explicitly():
    """Poison in a non-validated column (ts) must reject, not silently null."""
    ch = generate_changelog(5, n_convs=3, invalid_frac=0.0)
    bad = ch.set_column(
        7, "ts", pa.array(["not a timestamp"] * 5, pa.string())
    )
    out = validate_batch(bad)
    reasons = set(out.column("reject_reason").to_pylist())
    assert reasons == {"uncastable_column:ts"}


def test_done_marker_invalidates_on_crash_leftovers(tmp_path):
    from nifi_processors_ray.synth import write_generated_changelog

    out = str(tmp_path / "log")
    # simulate a crashed 16-file run: files on disk, NO marker
    write_generated_changelog(out, 800, files=16, n_convs=10)
    os.remove(os.path.join(out, "_DONE"))
    # rerun with different layout: stale files must not leak into the result
    paths = write_generated_changelog(out, 800, files=4, n_convs=10)
    assert len(paths) == 4
    on_disk = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(on_disk) == 4
