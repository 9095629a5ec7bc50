"""Randomized crash-point stress: commit failures at arbitrary epochs.

Drives the engine through a replay where the manifest commit fails at
randomly chosen epochs (several seeds), resuming with a fresh engine
after every injected crash — final state must always equal the oracle.
This generalizes the single-point 2PC-window test to arbitrary crash
schedules.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nifi_processors_ray.config import EngineConfig
from nifi_processors_ray.oracle import apply_changelog
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.schema import CHANGELOG_SCHEMA, align_to_schema
from nifi_processors_ray.synth import write_generated_changelog


class Boom(RuntimeError):
    pass


@pytest.mark.parametrize("seed", [1, 7, 23])
@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_random_commit_crashes_always_converge(tmp_path, seed, mode):
    log = str(tmp_path / "log")
    write_generated_changelog(log, 3000, files=2, n_convs=25, max_turns=16)
    lake = str(tmp_path / f"lake_{mode}_{seed}")

    def engine():
        return CdcEngine(
            EngineConfig(
                lake_dir=lake,
                changelog_paths=(log,),
                num_partitions=8,
                salt_factor=2,
                epoch_events=500,
                merge_mode=mode,
                compact_threshold=2,
            )
        )

    rng = np.random.default_rng(seed)
    crashes = 0
    for _ in range(30):  # bounded loop; normally converges in ≤6+crashes steps
        eng = engine()
        if rng.random() < 0.5:
            real = eng.store.commit
            state = {"left": int(rng.integers(0, 3))}

            def failing(man, real=real, state=state):
                if state["left"] == 0:
                    raise Boom()
                state["left"] -= 1
                return real(man)

            eng.store.commit = failing
            try:
                eng.replay()
            except Boom:
                crashes += 1
                continue
            break  # replay finished before the injected failure hit
        else:
            eng.replay()
            break

    eng = engine()
    eng.replay()  # ensure fully caught up
    got = eng.final_state(sort=True).to_pandas().reset_index(drop=True)
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
