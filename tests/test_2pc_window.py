"""Crash inside the 2PC window: files staged, manifest commit never lands.

The exactly-once claim hinges on this exact window (the reference's
checkpoint-then-commit gap, ``consumer/GetKinesisStream.java:283-295``):
a failure AFTER the merge tasks wrote their output files but BEFORE the
atomic manifest rename must leave the epoch logically un-happened, and a
resume must converge to the oracle state byte-for-byte.
"""

import pytest

from nifi_processors_ray.config import EngineConfig
from nifi_processors_ray.oracle import apply_changelog
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.synth import write_generated_changelog


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_crash_between_stage_and_commit(tmp_path, mode):
    log = str(tmp_path / "log")
    write_generated_changelog(log, 3000, files=2, n_convs=30, max_turns=16)

    def engine():
        return CdcEngine(
            EngineConfig(
                lake_dir=str(tmp_path / f"lake_{mode}"),
                changelog_paths=(log,),
                num_partitions=8,
                salt_factor=2,
                epoch_events=1000,
                merge_mode=mode,
                compact_threshold=2,
            )
        )

    eng = engine()
    eng.replay(max_epochs=1)  # epoch 1 commits normally
    committed = eng.store.latest()

    # epoch 2: merge tasks run and stage files, then the commit "crashes"
    class Boom(RuntimeError):
        pass

    real_commit = eng.store.commit
    eng.store.commit = lambda man: (_ for _ in ()).throw(Boom("power loss"))
    with pytest.raises(Boom):
        eng.run_epoch()
    # the manifest is untouched → the epoch never happened
    eng2 = engine()
    assert eng2.store.latest().epoch == committed.epoch
    assert eng2.store.latest().watermarks == committed.watermarks

    # resume replays the same window over the staged (now orphaned) files
    eng2.replay()
    got = eng2.final_state(sort=True).to_pandas().reset_index(drop=True)

    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nifi_processors_ray.schema import CHANGELOG_SCHEMA, align_to_schema

    full = pa.concat_tables(
        [
            align_to_schema(pq.read_table(os.path.join(log, f)), CHANGELOG_SCHEMA)
            for f in sorted(os.listdir(log))
            if f.endswith(".parquet")
        ]
    )
    want = apply_changelog(full).to_pandas()
    assert len(got) == len(want)
    assert (got["text"].values == want["text"].values).all()
    assert (got["conv_id"].values == want["conv_id"].values).all()
