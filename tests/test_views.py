"""Incremental view maintenance == full recompute, epoch by epoch."""

import pandas as pd
import pytest

from nifi_processors_ray.pipelines.conversations import token_stats
from nifi_processors_ray.pipelines.views import ConvStatsView
from nifi_processors_ray.synth import write_changelog_from_events

from test_replay_e2e import SF_DIR, make_engine


def _full(engine, epoch) -> pd.DataFrame:
    return (
        token_stats(engine.state_at(epoch))
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )


def test_incremental_view_tracks_every_epoch(tmp_path):
    log = str(tmp_path / "log")
    write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(str(tmp_path / "lake"), log, epoch_events=300)
    view = ConvStatsView(str(tmp_path / "view"))
    n_epochs = len(eng.replay())
    assert n_epochs == 4
    for epoch in range(1, n_epochs + 1):
        receipt = view.refresh(eng, epoch)
        assert receipt["epoch"] == epoch
        got = view.read().to_pandas().sort_values("conv_id").reset_index(drop=True)
        want = _full(eng, epoch)
        assert got.equals(want), f"incremental view diverged at epoch {epoch}"
    assert view.last_refreshed_epoch() == n_epochs


def test_refresh_to_head_and_idempotent_noop(tmp_path):
    log = str(tmp_path / "log")
    write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(str(tmp_path / "lake"), log, epoch_events=400)
    eng.replay()
    view = ConvStatsView(str(tmp_path / "view"))
    view.refresh_to_head(eng)
    got = view.read().to_pandas().sort_values("conv_id").reset_index(drop=True)
    want = (
        token_stats(eng.final_state())
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    # caught up: another refresh is a no-op leaving the same view
    noop = view.refresh_to_head(eng)
    assert noop["partitions_rewritten"] == 0
    again = view.read().to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert again.equals(want)


def test_crash_between_commits_keeps_previous_view(tmp_path):
    """A refresh that dies before the CURRENT swap leaves the prior
    consistent view (the manifest pattern at view scale)."""
    log = str(tmp_path / "log")
    write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(str(tmp_path / "lake"), log, epoch_events=500)
    eng.replay()
    view = ConvStatsView(str(tmp_path / "view"))
    view.refresh(eng, 1)
    t1 = view.read()
    # simulate a crash mid-refresh(2): snapshot written, CURRENT not swapped
    import pyarrow.parquet as pq
    import os

    pq.write_table(t1, os.path.join(view.dir, "view-2.parquet"))  # orphan
    assert view.last_refreshed_epoch() == 1  # CURRENT still names epoch 1
    # the retried refresh overwrites the orphan and commits
    view.refresh(eng, 2)
    assert view.last_refreshed_epoch() == 2


def test_refresh_rejects_out_of_order_epochs(tmp_path):
    """Skipping an epoch would silently lose its changes forever;
    regressing would overwrite a newer view with an older one."""
    log = str(tmp_path / "log")
    write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(str(tmp_path / "lake"), log, epoch_events=300)
    eng.replay()
    view = ConvStatsView(str(tmp_path / "view"))
    with pytest.raises(ValueError, match="strictly in order"):
        view.refresh(eng, 2)  # view is at epoch 0; must fold 1 first
    view.refresh(eng, 1)
    view.refresh(eng, 2)
    with pytest.raises(ValueError, match="strictly in order"):
        view.refresh(eng, 2)  # regression attempt


def test_refresh_rewrites_only_dirty_partitions(tmp_path):
    """The pruning contract: clean view partitions are carried forward
    BY REFERENCE (same immutable file in the new manifest) — a refresh's
    I/O is O(dirty partitions), never O(view)."""
    import pyarrow as pa

    from nifi_processors_ray.pipelines.views import _view_parts

    from nifi_processors_ray.synth import write_generated_changelog

    log = str(tmp_path / "log")
    # many conversations, small epochs: each epoch touches a subset of
    # the view's keys, so carry-forward partitions actually exist
    write_generated_changelog(
        log, 800, files=4, n_convs=2000, hot_frac=0.02, invalid_frac=0.0
    )
    eng = make_engine(str(tmp_path / "lake"), log, epoch_events=200)
    eng.replay()
    n_parts = 256
    view = ConvStatsView(str(tmp_path / "view"), num_partitions=n_parts)
    view.refresh(eng, 1)
    files1 = view.files()
    view.refresh(eng, 2)
    files2 = view.files()
    dirty = eng.touched_conversations(*eng._epoch_window(2))
    dirty_parts = set(
        _view_parts(pa.array(sorted(dirty), pa.string()), n_parts).tolist()
    )
    clean = [p for p in files2 if p not in dirty_parts]
    assert clean, "fixture vacuous: every view partition was dirty"
    for p in clean:  # carried forward by reference — zero I/O
        assert files2[p] == files1[p]
    for p in files2:
        if p in dirty_parts:
            assert files2[p].endswith("-e2.parquet")
    # and the folded view still equals the full recompute
    got = view.read().to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert got.equals(_full(eng, 2))


def test_view_num_partitions_pinned(tmp_path):
    """Partition placement is part of the on-disk contract — reopening
    with a different modulus fails loud instead of mis-routing rows."""
    log = str(tmp_path / "log")
    write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(str(tmp_path / "lake"), log, epoch_events=400)
    eng.replay()
    view = ConvStatsView(str(tmp_path / "view"), num_partitions=8)
    view.refresh(eng, 1)
    with pytest.raises(ValueError, match="num_partitions"):
        ConvStatsView(str(tmp_path / "view"), num_partitions=16)
