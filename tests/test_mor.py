"""Merge-on-read mode: oracle equivalence, auto-compaction, write
amplification vs copy-on-write."""

import os

import pyarrow.parquet as pq
import pytest

from nifi_processors_ray.config import EngineConfig
from nifi_processors_ray.oracle import apply_changelog
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.synth import generate_changelog, write_generated_changelog


def _engine(tmp_path, name, **over):
    log = str(tmp_path / "log")
    if not os.path.exists(log):
        write_generated_changelog(
            log, 2000, files=2, n_convs=30, max_turns=16, invalid_frac=0.01
        )
    kwargs = dict(
        lake_dir=str(tmp_path / name),
        changelog_paths=(log,),
        num_partitions=8,
        salt_factor=2,
        epoch_events=200,  # 10 epochs — lake >> epoch, the MOR regime
    )
    kwargs.update(over)
    return CdcEngine(EngineConfig(**kwargs))


def _full_changelog(tmp_path):
    import pyarrow as pa

    tables = [
        pq.read_table(str(tmp_path / "log" / f))
        for f in sorted(os.listdir(tmp_path / "log"))
        if f.endswith(".parquet")
    ]
    from nifi_processors_ray.schema import CHANGELOG_SCHEMA, align_to_schema

    return pa.concat_tables([align_to_schema(t, CHANGELOG_SCHEMA) for t in tables])


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_multi_epoch_replay_matches_oracle(tmp_path, mode):
    eng = _engine(tmp_path, f"lake_{mode}", merge_mode=mode)
    results = eng.replay()
    assert len(results) == 10
    got = eng.final_state(sort=True).to_pandas().reset_index(drop=True)
    want = apply_changelog(_full_changelog(tmp_path)).to_pandas()
    assert len(got) == len(want)
    assert (got["conv_id"].values == want["conv_id"].values).all()
    assert (got["text"].values == want["text"].values).all()


def test_mor_compaction_bounds_file_count(tmp_path):
    eng = _engine(tmp_path, "lake_mor_c", merge_mode="mor", compact_threshold=3)
    eng.replay()
    man = eng.store.latest()
    assert all(len(fs) <= 3 for fs in man.files.values())
    # compaction folds actually happened (some partitions saw a replace)
    lineage = eng.lineage().to_pandas()
    assert (lineage["file_mode"] == "replace").any()
    assert (lineage["file_mode"] == "append").any()


def test_mor_writes_less_than_cow_on_update_heavy_stream(tmp_path):
    cow = _engine(tmp_path, "lake_cow", merge_mode="cow")
    cow.replay()
    mor = _engine(tmp_path, "lake_mor", merge_mode="mor")
    mor.replay()

    def data_bytes(lake):
        total = 0
        for root, _, files in os.walk(os.path.join(lake, "data")):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total

    cow_b = data_bytes(cow.cfg.lake_dir)
    mor_b = data_bytes(mor.cfg.lake_dir)
    # cow rewrote the whole (growing) lake 10×; mor wrote ~10 deltas + folds
    assert mor_b < cow_b, (mor_b, cow_b)

    # and both read back identically
    a = cow.final_state(sort=True).to_pandas().reset_index(drop=True)
    b = mor.final_state(sort=True).to_pandas().reset_index(drop=True)
    assert a.equals(b)


def test_mor_resume_midstream(tmp_path):
    eng = _engine(tmp_path, "lake_mor_r", merge_mode="mor")
    eng.replay(max_epochs=4)
    # a fresh engine object resumes from the manifest and converges
    eng2 = _engine(tmp_path, "lake_mor_r", merge_mode="mor")
    eng2.replay()
    got = eng2.final_state(sort=True).to_pandas().reset_index(drop=True)
    want = apply_changelog(_full_changelog(tmp_path)).to_pandas()
    assert len(got) == len(want)
    assert (got["text"].values == want["text"].values).all()


def test_auto_mode_oracle_and_mixed_file_modes(tmp_path):
    """merge_mode='auto' picks per partition per epoch: early epochs
    (change ratio high vs a small base) rewrite (cow), later epochs
    (small change slice of a grown partition) delta-append (mor) —
    and the converged state still equals the oracle."""
    import pyarrow as pa

    from nifi_processors_ray.schema import CHANGELOG_SCHEMA, align_to_schema

    log = str(tmp_path / "log_auto")
    write_generated_changelog(
        log, 3000, files=2, n_convs=300, max_turns=32, invalid_frac=0.01
    )
    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake_auto"),
            changelog_paths=(log,),
            num_partitions=8,
            salt_factor=2,
            epoch_events=300,
            merge_mode="auto",
        )
    )
    eng.replay()
    got = eng.final_state(sort=True).to_pandas().reset_index(drop=True)
    tables = [
        pq.read_table(os.path.join(log, f))
        for f in sorted(os.listdir(log))
        if f.endswith(".parquet")
    ]
    want = apply_changelog(
        pa.concat_tables([align_to_schema(t, CHANGELOG_SCHEMA) for t in tables])
    ).to_pandas()
    assert len(got) == len(want)
    assert (got["conv_id"].values == want["conv_id"].values).all()
    assert (got["text"].values == want["text"].values).all()
    modes = set(
        eng.lineage().to_pandas()["file_mode"].dropna().unique().tolist()
    )
    assert modes == {"append", "replace"}, f"auto never mixed: {modes}"


def test_auto_mode_measures_distinct_keys_not_events(tmp_path):
    """The auto change-ratio numerator is DISTINCT keys, not applied
    events: an update-heavy epoch (many events hammering few keys)
    changes a tiny fraction of the partition and must delta-append —
    an events-based numerator would overstate the changed fraction by
    the events-per-key factor and wrongly rewrite (the round-4
    crossover harness caught exactly this on the generated stream)."""
    import datetime

    import pyarrow as pa

    from nifi_processors_ray.schema import CHANGELOG_SCHEMA

    log = tmp_path / "log_upd"
    log.mkdir()
    ts = datetime.datetime(2024, 1, 1)
    n_base, n_hot_keys, n_updates = 4000, 20, 2000

    def rows(seq0, ops):
        return pa.table(
            {
                "seq": pa.array([seq0 + i for i in range(len(ops))], pa.int64()),
                "op": pa.array([o for o, c, t in ops], pa.string()),
                "conv_id": pa.array([c for o, c, t in ops], pa.string()),
                "turn_idx": pa.array([t for o, c, t in ops], pa.int32()),
                "role": pa.array(["user"] * len(ops), pa.string()),
                "text": pa.array([f"s{seq0 + i}" for i in range(len(ops))], pa.string()),
                "tool": pa.array([""] * len(ops), pa.string()),
                "ts": pa.array([ts] * len(ops), pa.timestamp("us")),
                "batch_id": pa.array(["b"] * len(ops), pa.string()),
            },
            schema=CHANGELOG_SCHEMA,
        )

    base_ops = [("I", f"c{i}", 0) for i in range(n_base)]
    upd_ops = [("U", f"c{i % n_hot_keys}", 0) for i in range(n_updates)]
    pq.write_table(rows(1, base_ops), str(log / "chunk-000.parquet"))
    pq.write_table(rows(1 + n_base, upd_ops), str(log / "chunk-001.parquet"))

    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake_upd"),
            changelog_paths=(str(log),),
            num_partitions=8,
            salt_factor=1,
            epoch_events=n_base,
            merge_mode="auto",
            auto_mor_ratio=0.2,
        )
    )
    eng.replay()
    lin = eng.lineage().to_pandas()
    ep2 = lin[(lin["commit_epoch"] == 2) & (lin["n_applied"] > 0)]
    assert len(ep2) > 0
    # ~250 update EVENTS per partition vs ~500 prior rows (ratio 0.5
    # by events) but only ~2-3 distinct KEYS (ratio < 0.01) — every
    # touched partition must append
    assert set(ep2["file_mode"]) == {"append"}, ep2[["partition", "file_mode"]]


def test_compact_partitions_is_a_stateless_epoch(tmp_path):
    """Standalone compaction folds every multi-file partition to ONE
    file set, advances the epoch WITHOUT consuming events (watermarks
    unchanged, changefeed empty, time travel to the prior epoch still
    exact), leaves state identical to the oracle, and a subsequent
    replay resumes normally."""
    eng = _engine(tmp_path, "lake_compact", merge_mode="mor", epoch_events=500)
    eng.replay(max_epochs=2)  # partial stream → multi-file partitions
    man_before = eng.store.latest()
    assert any(len(fs) > 1 for fs in man_before.files.values()), "fixture vacuous"
    state_before = eng.final_state(sort=True).to_pandas().reset_index(drop=True)

    receipt = eng.compact_partitions()
    assert receipt["epoch"] == man_before.epoch + 1
    assert receipt["partitions_compacted"] > 0
    assert receipt["files_after"] < receipt["files_before"]
    man_after = eng.store.latest()
    assert man_after.watermarks == man_before.watermarks  # no events consumed
    # every partition folded to a single (possibly split) COW file set
    for p, fs in man_after.files.items():
        assert all(f"epoch={receipt['epoch']}" in f for f in fs) or len(fs) == 1
    state_after = eng.final_state(sort=True).to_pandas().reset_index(drop=True)
    assert state_after.equals(state_before)
    # time travel across the compaction boundary + empty changefeed
    tt = eng.state_at(man_before.epoch).to_pandas()
    assert len(tt) == len(state_before)
    assert eng.epoch_changes(receipt["epoch"]).count() == 0
    # idempotent: nothing left to fold
    again = eng.compact_partitions()
    assert again["partitions_compacted"] == 0
    # the stream resumes exactly-once after the maintenance commit
    eng2 = _engine(tmp_path, "lake_compact", merge_mode="mor", epoch_events=500)
    eng2.replay()
    got = eng2.final_state(sort=True).to_pandas().reset_index(drop=True)
    want = apply_changelog(_full_changelog(tmp_path)).to_pandas()
    assert len(got) == len(want)
    assert (got["text"].values == want["text"].values).all()


def test_compact_crash_before_commit_leaves_lake_intact(tmp_path):
    """A compaction that dies after writing files but BEFORE the
    manifest commit changes nothing: the prior manifest still governs,
    reads are unaffected, the orphans are vacuumable, and a retried
    compact converges."""
    eng = _engine(tmp_path, "lake_ccrash", merge_mode="mor", epoch_events=500)
    eng.replay(max_epochs=2)
    man_before = eng.store.latest()
    state_before = eng.final_state(sort=True).to_pandas().reset_index(drop=True)

    real_commit = eng.store.commit

    def boom(man):
        raise OSError("simulated crash at the commit point")

    eng.store.commit = boom
    with pytest.raises(OSError, match="simulated crash"):
        eng.compact_partitions()
    eng.store.commit = real_commit

    # prior manifest still current; state unchanged
    assert eng.store.latest().epoch == man_before.epoch
    state_mid = eng.final_state(sort=True).to_pandas().reset_index(drop=True)
    assert state_mid.equals(state_before)
    # the retried compact succeeds and converges to the same state
    receipt = eng.compact_partitions()
    assert receipt["partitions_compacted"] > 0
    state_after = eng.final_state(sort=True).to_pandas().reset_index(drop=True)
    assert state_after.equals(state_before)
    # the crashed attempt's orphans (same epoch number as the retry's
    # files) are either reused byte-identically or removed by vacuum
    eng.vacuum()
    man = eng.store.latest()
    live = {os.path.join(eng.cfg.lake_dir, f) for fs in man.files.values() for f in fs}
    for root, _, files in os.walk(os.path.join(eng.cfg.lake_dir, "data")):
        for f in files:
            assert os.path.join(root, f) in live, f"orphan survived vacuum: {f}"


def test_auto_cow_fold_reuses_delta_and_matches_pure_cow(tmp_path):
    """When auto computes the ratio's per-key delta and then picks COW,
    the fold consumes the already-reduced delta (not the raw epoch).
    Pinned: final state identical to pure COW — the associativity the
    MOR read path already relies on, exercised on the write path."""
    eng_auto = _engine(
        tmp_path, "lake_auto_reuse", merge_mode="auto", auto_mor_ratio=0.0001
    )  # ratio so tight auto always folds COW after computing the delta
    eng_auto.replay()
    eng_cow = _engine(tmp_path, "lake_cow_ref", merge_mode="cow")
    eng_cow.replay()
    got = eng_auto.final_state(sort=True).to_pandas().reset_index(drop=True)
    want = eng_cow.final_state(sort=True).to_pandas().reset_index(drop=True)
    assert got.equals(want)
    # auto picked COW on every incremental epoch (no delta files in the
    # manifest) — branch EXECUTION is pinned by the kernel-law test below
    man = eng_auto.store.latest()
    assert all(
        not f.endswith(".delta.parquet") for fs in man.files.values() for f in fs
    )


def test_delta_reuse_kernel_law():
    """The equivalence the reuse branch depends on, pinned at the kernel
    level: merge_deltas([prior, epoch_delta(valid)]) == lww_merge(prior,
    valid) — including tombstone wins, schema drift (prior lacks `tool`),
    duplicate-seq ties, and a key absent from the prior."""
    import pyarrow as pa

    from nifi_processors_ray.schema import CHANGELOG_SCHEMA, align_to_schema
    from nifi_processors_ray.stages.merge import (
        LAKE_SCHEMA,
        epoch_delta,
        lww_merge,
        merge_deltas,
    )

    prior = align_to_schema(
        pa.table(
            {
                "conv_id": ["a", "a", "b", "d"],
                "turn_idx": [0, 1, 0, 0],
                "role": ["user", "asst", "user", "user"],
                "text": ["p0", "p1", "pb", "pd"],
                "ts": [None] * 4,
                "seq": [1, 2, 3, 4],
            }
        ),
        pa.schema([f for f in LAKE_SCHEMA if f.name != "tool"]),  # drifted prior
    )
    valid = align_to_schema(
        pa.table(
            {
                "conv_id": ["a", "a", "a", "b", "c", "c"],
                "turn_idx": [0, 0, 1, 0, 0, 0],
                "op": ["U", "U", "D", "U", "I", "U"],
                "role": ["user"] * 6,
                "text": ["v1", "v2", None, "vb", "vc1", "vc2"],
                "tool": [None, "t", None, None, None, None],
                "ts": [None] * 6,
                "seq": [10, 11, 12, 13, 14, 14],  # duplicate seq tie on c
            }
        ),
        CHANGELOG_SCHEMA,
    )
    a = lww_merge(prior, valid)
    b = merge_deltas([prior, epoch_delta(valid)])
    assert a.equals(b), f"\n{a.to_pydict()}\nvs\n{b.to_pydict()}"
    # spot semantics: a.0 updated to v2, a.1 tombstoned away, d untouched
    d = a.to_pydict()
    keys = set(zip(d["conv_id"], d["turn_idx"]))
    assert ("a", 1) not in keys and ("d", 0) in keys
    assert d["text"][d["conv_id"].index("a")] == "v2"
