"""Bootstrap: bulk snapshot load + CDC tail == full replay.

The two-phase ingest every real CDC consumer uses (a snapshot of the
table as of seq S, then the change log from S on) must converge to the
same state as replaying the whole log — and must go through the same
validate/partition/merge/2PC machinery so every invariant holds for
the bulk phase.
"""

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from nifi_processors_ray.oracle import apply_changelog
from nifi_processors_ray.synth import write_changelog_from_events

from test_replay_e2e import SF_DIR, make_engine, read_log

SNAP_SEQ = 499


@pytest.fixture(scope="module")
def log_and_snapshot(tmp_path_factory):
    log = str(tmp_path_factory.mktemp("log"))
    paths = write_changelog_from_events(SF_DIR, log, files=3)
    full = read_log(paths)
    snap = apply_changelog(full.filter(pc.less_equal(full.column("seq"), SNAP_SEQ)))
    snap_dir = str(tmp_path_factory.mktemp("snap"))
    snap_path = os.path.join(snap_dir, "snapshot.parquet")
    pq.write_table(snap, snap_path)
    return log, paths, snap_path


def test_bootstrap_then_tail_equals_full_replay(log_and_snapshot, tmp_lake):
    log, paths, snap_path = log_and_snapshot
    eng = make_engine(tmp_lake, log, epoch_events=300)
    res = eng.bootstrap(snap_path, SNAP_SEQ)
    assert res.epoch == 1 and res.n_rejected == 0 and res.n_applied > 0
    # the tail starts strictly after the snapshot seq
    assert eng.store.latest().min_watermark == SNAP_SEQ
    tail = eng.replay()
    assert tail and tail[0].seq_lo == SNAP_SEQ + 1
    got = eng.final_state(sort=True).to_pandas().reset_index(drop=True)
    want = apply_changelog(read_log(paths)).to_pandas().reset_index(drop=True)
    assert got.equals(want), "bootstrap + tail != full replay"


def test_bootstrap_refuses_nonempty_lake(log_and_snapshot, tmp_lake):
    log, _, snap_path = log_and_snapshot
    eng = make_engine(tmp_lake, log, epoch_events=300)
    eng.replay(max_epochs=1)
    with pytest.raises(RuntimeError, match="empty lake"):
        eng.bootstrap(snap_path, SNAP_SEQ)


def test_bootstrap_refuses_latest_position(log_and_snapshot, tmp_lake):
    log, _, snap_path = log_and_snapshot
    eng = make_engine(tmp_lake, log, initial_position="LATEST")
    with pytest.raises(RuntimeError, match="cannot be bootstrapped"):
        eng.bootstrap(snap_path, SNAP_SEQ)
