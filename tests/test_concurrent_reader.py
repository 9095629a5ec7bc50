"""Snapshot isolation under a CONCURRENT writer (round-5 probe): a
reader that opens the lake while a replay epoch is in flight must see
exactly the last COMMITTED epoch — never partial epoch-2 rows — and the
writer must still converge to the full-stream oracle afterwards.

Mechanism under test: the 2PC manifest commit. Data files land first;
the atomic manifest rename is the only thing a reader ever follows, so
an in-flight epoch is invisible by construction.  The writer runs in a
separate process (its own Ray session) gated by a file sentinel inside
the enrich hook; the reader uses this test session.
"""

import json
import os
import subprocess
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from nifi_processors_ray.config import EngineConfig
from nifi_processors_ray.oracle import apply_changelog
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.schema import CHANGELOG_SCHEMA, align_to_schema
from nifi_processors_ray.stages.merge import TRANSCRIPT_COLS
from nifi_processors_ray.synth import write_generated_changelog

EPOCH_EVENTS = 400

WRITER_SCRIPT = """
import os, sys, time
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
from nifi_processors_ray.config import EngineConfig
from nifi_processors_ray.pipelines.replay import CdcEngine

LAKE, LOG, REACHED, RELEASE = sys.argv[1:5]
EPOCH_EVENTS = int(sys.argv[5])


def gate(batch):
    import os as _os
    import time as _time

    import pyarrow.compute as _pc

    # epochs are seq ranges: any seq >= EPOCH_EVENTS is epoch >= 2 work.
    # Gate there so the test can read the lake mid-epoch-2.
    if batch.num_rows and _pc.max(batch.column("seq")).as_py() >= EPOCH_EVENTS:
        with open(REACHED, "w") as f:
            f.write("mid-epoch-2")
        for _ in range(2400):  # <= 120 s, then proceed (test will fail loudly)
            if _os.path.exists(RELEASE):
                break
            _time.sleep(0.05)
    return batch


eng = CdcEngine(EngineConfig(
    lake_dir=LAKE, changelog_paths=(LOG,), num_partitions=4,
    epoch_events=EPOCH_EVENTS, enrich=gate,
))
res = eng.replay()
print("WRITER-DONE", len(res), flush=True)
ray.shutdown()
"""


def _read_log(log_dir):
    import glob

    return pa.concat_tables(
        align_to_schema(pq.read_table(p), CHANGELOG_SCHEMA)
        for p in sorted(glob.glob(os.path.join(log_dir, "*.parquet")))
    )


def test_reader_sees_committed_epoch_during_inflight_replay(tmp_path):
    log = str(tmp_path / "log")
    write_generated_changelog(log, 1000, files=2, n_convs=12)
    lake = str(tmp_path / "lake")
    reached = str(tmp_path / "reached")
    release = str(tmp_path / "release")
    script = tmp_path / "writer.py"
    script.write_text(WRITER_SCRIPT)
    proc = subprocess.Popen(
        [sys.executable, "-u", str(script), lake, log, reached, release,
         str(EPOCH_EVENTS)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd="/root/repo",
    )
    try:
        deadline = time.time() + 120
        while not os.path.exists(reached):
            if proc.poll() is not None:
                raise AssertionError(
                    f"writer exited early: {proc.communicate()[1][-2000:]}"
                )
            if time.time() > deadline:
                raise AssertionError("writer never reached epoch 2")
            time.sleep(0.1)

        # ---- writer is mid-epoch-2: read the lake from THIS process ----
        reader = CdcEngine(EngineConfig(
            lake_dir=lake, changelog_paths=(log,), num_partitions=4,
            epoch_events=EPOCH_EVENTS,
        ))
        man = reader.store.latest()
        assert man is not None and man.epoch == 1, "epoch 1 must be committed"
        got = (
            reader.final_state(sort=True)
            .to_pandas()[TRANSCRIPT_COLS]
            .reset_index(drop=True)
        )
        full = _read_log(log)
        epoch1 = full.filter(pc.less(full.column("seq"), EPOCH_EVENTS))
        want = apply_changelog(epoch1).to_pandas()[TRANSCRIPT_COLS].reset_index(drop=True)
        assert got.equals(want), "reader saw partial epoch-2 state"
        # the explicit AS-OF read agrees
        got_at = (
            reader.state_at(man.epoch, sort=True)
            .to_pandas()[TRANSCRIPT_COLS]
            .reset_index(drop=True)
        )
        assert got_at.equals(want)
    finally:
        with open(release, "w") as f:
            f.write("go")
        out, err = proc.communicate(timeout=180)
    assert proc.returncode == 0, err[-2000:]
    assert "WRITER-DONE" in out

    # ---- after the writer finishes: full-stream convergence ----
    reader2 = CdcEngine(EngineConfig(
        lake_dir=lake, changelog_paths=(log,), num_partitions=4,
        epoch_events=EPOCH_EVENTS,
    ))
    final = (
        reader2.final_state(sort=True)
        .to_pandas()[TRANSCRIPT_COLS]
        .reset_index(drop=True)
    )
    oracle = apply_changelog(_read_log(log)).to_pandas()[TRANSCRIPT_COLS].reset_index(
        drop=True
    )
    assert final.equals(oracle)
