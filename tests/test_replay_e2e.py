"""End-to-end replay-equivalence oracle — the reference's IT analog.

Deterministic synthetic change stream → engine replay → final lake
state compared row-for-row against the single-process naive applier.
Invariant: per-turn text equality under stable (conv_id, turn_idx)
ordering (BASELINE.json).  Plus crash/resume (exactly-once), idempotent
re-run, schema evolution, and the hot-conversation skew path.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nifi_processors_ray.config import EngineConfig
from nifi_processors_ray.oracle import apply_changelog, split_valid
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.schema import CHANGELOG_SCHEMA, align_to_schema
from nifi_processors_ray.synth import (
    generate_changelog,
    write_changelog_from_events,
    write_generated_changelog,
)

SF_DIR = "/root/testdata/sf0.001"


def read_log(paths):
    return pa.concat_tables(
        align_to_schema(pq.read_table(p), CHANGELOG_SCHEMA) for p in paths
    )


def assert_matches_oracle(engine, paths):
    final = engine.final_state(sort=True).to_pandas().reset_index(drop=True)
    oracle = apply_changelog(read_log(paths)).to_pandas().reset_index(drop=True)
    assert len(final) == len(oracle)
    assert final.equals(oracle), "engine final state != naive oracle"


def make_engine(tmp_lake, log_dir, **over):
    kwargs = dict(
        lake_dir=tmp_lake,
        changelog_paths=(log_dir,),
        num_partitions=8,
        salt_factor=2,
        epoch_events=100_000,
        merge_concurrency=2,
    )
    kwargs.update(over)
    return CdcEngine(EngineConfig(**kwargs))


def test_replay_from_events_matches_oracle(tmp_lake, tmp_path):
    log = str(tmp_path / "log")
    paths = write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(tmp_lake, log)
    results = eng.replay()
    assert len(results) == 1
    assert_matches_oracle(eng, paths)
    # rejected side table holds exactly the invalid rows
    _, expected_rej = split_valid(read_log(paths))
    assert eng.rejected().count() == expected_rej.num_rows


def test_multi_epoch_replay_matches_oracle(tmp_lake, tmp_path):
    log = str(tmp_path / "log")
    paths = write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(tmp_lake, log, epoch_events=300)
    results = eng.replay()
    assert len(results) == 4  # 1000 events / 300
    assert_matches_oracle(eng, paths)


def test_crash_resume_exactly_once(tmp_lake, tmp_path):
    """Stop after epoch 1, resume with a FRESH engine → identical state."""
    log = str(tmp_path / "log")
    paths = write_changelog_from_events(SF_DIR, log, files=3)
    eng1 = make_engine(tmp_lake, log, epoch_events=400)
    eng1.replay(max_epochs=1)  # "crash" here
    eng2 = make_engine(tmp_lake, log, epoch_events=400)
    man = eng2.current_manifest()
    assert man.epoch == 1 and man.min_watermark >= 0
    eng2.replay()
    assert_matches_oracle(eng2, paths)


def test_rerun_when_caught_up_is_noop(tmp_lake, tmp_path):
    log = str(tmp_path / "log")
    paths = write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(tmp_lake, log)
    eng.replay()
    epoch_before = eng.store.latest().epoch
    assert eng.replay() == []  # idempotent: nothing to do
    assert eng.store.latest().epoch == epoch_before
    assert_matches_oracle(eng, paths)


def test_schema_evolution_tool_column_appears_midstream(tmp_lake, tmp_path):
    """First log file physically lacks `tool`; final schema is unified."""
    log = str(tmp_path / "log")
    paths = write_changelog_from_events(SF_DIR, log, files=3)
    assert "tool" not in pq.read_schema(paths[0]).names
    assert "tool" in pq.read_schema(paths[-1]).names
    eng = make_engine(tmp_lake, log, epoch_events=250)  # epoch boundary inside file 0
    eng.replay()
    final = eng.final_state()
    assert "tool" in final.schema().names
    assert_matches_oracle(eng, paths)


def test_generated_stream_with_hot_conversation(tmp_lake, tmp_path):
    """Skew path: one conversation holds ~20% of all events; salted
    partitioner spreads it; result still matches the oracle."""
    log = str(tmp_path / "log")
    paths = write_generated_changelog(log, n_events=20_000, files=4, n_convs=200,
                                      hot_frac=0.2, seed=7)
    eng = make_engine(tmp_lake, log, num_partitions=16, salt_factor=4, epoch_events=8_000)
    results = eng.replay()
    assert len(results) == 3
    assert_matches_oracle(eng, paths)
    # the hot conversation was actually spread over >1 partition
    import pyarrow.compute as pc
    from nifi_processors_ray.stages.partition import add_partition_column

    hot = read_log(paths).filter(pc.equal(pc.field("conv_id"), "conv-0"))
    parts = set(add_partition_column(hot, 16, 4).column("__part").to_pylist())
    assert len(parts) > 1


def test_initial_position_latest_skips_backlog(tmp_lake, tmp_path):
    log = str(tmp_path / "log")
    write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(tmp_lake, log, initial_position="LATEST")
    assert eng.replay() == []
    assert eng.final_state().count() == 0


def test_lineage_accounts_for_every_applied_row(tmp_lake, tmp_path):
    log = str(tmp_path / "log")
    paths = write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(tmp_lake, log, epoch_events=400)
    results = eng.replay()
    lin = eng.lineage().to_pandas()
    valid, rejected = split_valid(read_log(paths))
    assert lin["n_applied"].sum() == valid.num_rows
    assert lin["n_rejected"].sum() == rejected.num_rows
    assert set(lin["commit_epoch"]) == {r.epoch for r in results}
