"""Time travel (``state_at``) and changefeed (``changes_between`` /
``epoch_changes``) over the immutable manifest history.

Oracle strategy: the naive applier run on a seq-truncated changelog is
the state as of any epoch's watermark; the changefeed oracle is the
max-seq valid row per key inside the window, computed in pandas.
"""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from nifi_processors_ray.oracle import apply_changelog, split_valid
from nifi_processors_ray.synth import write_changelog_from_events

from test_replay_e2e import SF_DIR, make_engine, read_log


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    lake = str(tmp_path_factory.mktemp("lake"))
    log = str(tmp_path_factory.mktemp("log"))
    paths = write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(lake, log, epoch_events=300, merge_mode="mor", compact_threshold=3)
    results = eng.replay()
    assert len(results) == 4  # 1000 events / 300
    return eng, paths


def _oracle_at(paths, cutoff):
    log = read_log(paths)
    return apply_changelog(log.filter(pc.less_equal(log.column("seq"), cutoff)))


def test_state_at_every_epoch_matches_truncated_oracle(engine):
    eng, paths = engine
    for epoch in (1, 2, 3, 4):
        man = eng.store.at_epoch(epoch)
        got = eng.state_at(epoch, sort=True).to_pandas().reset_index(drop=True)
        want = _oracle_at(paths, man.min_watermark).to_pandas().reset_index(drop=True)
        assert got.equals(want), f"epoch {epoch} snapshot != truncated oracle"


def test_state_at_latest_equals_final_state(engine):
    eng, _ = engine
    latest = eng.store.latest().epoch
    a = eng.state_at(latest, sort=True).to_pandas()
    b = eng.final_state(sort=True).to_pandas()
    assert a.equals(b)


def test_state_at_unknown_epoch_raises(engine):
    eng, _ = engine
    with pytest.raises(ValueError, match="no manifest committed"):
        eng.state_at(99)


def test_epoch_zero_snapshot_is_empty(engine):
    eng, _ = engine
    assert eng.state_at(0).count() == 0


def _changefeed_oracle(paths, lo, hi):
    log = read_log(paths)
    valid, _ = split_valid(log)
    valid = valid.filter(
        pc.and_(pc.greater(valid.column("seq"), lo), pc.less_equal(valid.column("seq"), hi))
    )
    df = valid.to_pandas()
    # drop_duplicates(keep='last'), NOT groupby().last(): the latter
    # skips NaNs per column and would resurrect pre-delete values
    df = df.sort_values(["conv_id", "turn_idx", "seq"]).drop_duplicates(
        ["conv_id", "turn_idx"], keep="last"
    )
    return df[["conv_id", "turn_idx", "op", "role", "text", "tool", "ts", "seq"]].sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)


def test_changes_between_matches_pandas_oracle(engine):
    eng, paths = engine
    for lo, hi in ((-1, 299), (299, 599), (599, 999), (-1, 999)):
        got = (
            eng.changes_between(lo, hi)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        want = _changefeed_oracle(paths, lo, hi)
        assert got.equals(want), f"changefeed ({lo}, {hi}] != oracle"


def test_epoch_changes_covers_each_epoch_window(engine):
    eng, paths = engine
    for epoch in (1, 2, 3, 4):
        lo = eng.store.at_epoch(epoch - 1).min_watermark
        hi = eng.store.at_epoch(epoch).min_watermark
        got = (
            eng.epoch_changes(epoch)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert got.equals(_changefeed_oracle(paths, lo, hi))


def test_epoch_changes_default_is_latest(engine):
    eng, _ = engine
    a = eng.epoch_changes().to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = (
        eng.epoch_changes(eng.store.latest().epoch)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_changefeed_deletes_are_visible(engine):
    """Unlike the converged state, the feed carries op='D' rows (the
    consumer must see deletions to mirror them)."""
    eng, _ = engine
    ops = set(eng.epoch_changes().to_pandas()["op"].unique())
    assert "D" in ops


def test_applying_feed_windows_reproduces_state(engine):
    """Folding each epoch's net changes LWW over the previous snapshot
    reproduces the next snapshot — the consumer-side contract."""
    import pandas as pd

    eng, _ = engine
    state = None  # keyed dict: (conv_id, turn_idx) -> row
    for epoch in (1, 2, 3, 4):
        feed = eng.epoch_changes(epoch).to_pandas()
        state = feed if state is None else (
            pd.concat([state, feed])
            .sort_values("seq")
            .drop_duplicates(["conv_id", "turn_idx"], keep="last")
        )
        live = state[state["op"] != "D"]
        want = (
            eng.state_at(epoch, sort=True).to_pandas().reset_index(drop=True)
        )
        got = (
            live[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert got.equals(want), f"feed fold diverged at epoch {epoch}"


def test_point_lookup_prunes_partitions_and_matches_full_scan(engine):
    """read_conversation touches only the ≤salt_factor partitions the
    key can hash to, and returns exactly the full scan's rows for that
    conversation in turn order."""
    eng, _ = engine
    parts = eng.lookup_partitions("c0")
    assert 1 <= len(parts) <= eng.cfg.salt_factor < eng.cfg.num_partitions
    got = eng.read_conversation("c0").to_pandas().reset_index(drop=True)
    full = eng.final_state(sort=True).to_pandas()
    want = full[full["conv_id"] == "c0"].reset_index(drop=True)
    assert got.equals(want)
    assert len(got) > 0  # 'c0' is the hot conversation: always present


def test_point_lookup_missing_conversation_is_empty(engine):
    eng, _ = engine
    assert eng.read_conversation("no-such-conv").count() == 0


def test_vacuum_invalidates_old_snapshots_loudly(engine):
    eng, _ = engine
    # COW/MOR folds leave superseded files around until vacuum; after
    # vacuum an old snapshot whose files were deleted must FAIL, not
    # return a partial table.  (Run last: vacuum mutates the lake dir.)
    eng.vacuum()
    latest = eng.store.latest().epoch
    assert eng.state_at(latest).count() > 0  # current snapshot unaffected
    with pytest.raises(RuntimeError, match="no longer time-travelable"):
        for epoch in (1, 2, 3):
            eng.state_at(epoch)


def test_expire_snapshots_bounds_manifest_history(engine):
    """expire keeps the newest K snapshots (current always included);
    expired epochs stop being addressable.  Runs after the vacuum test —
    both mutate the shared lake in compatible order."""
    eng, _ = engine
    before = eng.store.epochs()
    assert len(before) >= 4
    deleted = eng.expire_snapshots(keep_last=2)
    assert deleted == len(before) - 2
    after = eng.store.epochs()
    assert after == before[-2:]
    # the current snapshot still resolves and still reads
    assert eng.store.latest().epoch == after[-1]
    assert eng.final_state().count() > 0
    # expired epochs are no longer addressable
    with pytest.raises(ValueError, match="no manifest committed"):
        eng.state_at(before[0])


def test_expire_keep_last_validates():
    from nifi_processors_ray.state.manifest import ManifestStore
    import tempfile

    store = ManifestStore(tempfile.mkdtemp(prefix="npr_man_"))
    with pytest.raises(ValueError):
        store.expire(0)
    assert store.expire(3) == 0  # empty store: nothing to delete


def test_epoch_changes_after_expiry_fails_loud(engine):
    """An epoch whose PREDECESSOR manifest was expired cannot name its
    window start; falling back to -1 would present the cumulative
    change since genesis as one epoch's diff.  (Runs after the expire
    test: only the newest two manifests remain.)"""
    eng, _ = engine
    remaining = eng.store.epochs()
    assert len(remaining) == 2
    # newest epoch still has its predecessor → works
    assert eng.epoch_changes(remaining[-1]) is not None
    # older remaining epoch lost its predecessor → loud failure
    with pytest.raises(ValueError, match="unrecoverable"):
        eng.epoch_changes(remaining[0])


# ---------------------------------------------------------------------------
# snapshot-to-snapshot diff (state_diff)
# ---------------------------------------------------------------------------


def _pandas_state_diff(old, new):
    """Reference diff of two state frames keyed by (conv_id, turn_idx)."""
    cols = ["role", "text", "tool", "ts"]
    o = old.set_index(["conv_id", "turn_idx"])
    n = new.set_index(["conv_id", "turn_idx"])
    rows = []
    for key in sorted(set(o.index) | set(n.index)):
        in_o, in_n = key in o.index, key in n.index
        if in_o and not in_n:
            rows.append((*key, "deleted"))
        elif in_n and not in_o:
            rows.append((*key, "added"))
        else:
            a, b = o.loc[key], n.loc[key]
            if any(
                not ((pd.isna(a[c]) and pd.isna(b[c])) or a[c] == b[c]) for c in cols
            ):
                rows.append((*key, "updated"))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "change_kind"])


@pytest.fixture(scope="module")
def diff_engine(tmp_path_factory):
    # a private engine: the shared module fixture's early snapshots get
    # expired/vacuumed by the retention tests above, and state_diff
    # needs all four epochs alive
    lake = str(tmp_path_factory.mktemp("diff_lake"))
    log = str(tmp_path_factory.mktemp("diff_log"))
    write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(lake, log, epoch_events=300, merge_mode="mor", compact_threshold=3)
    assert len(eng.replay()) == 4
    return eng


def test_state_diff_matches_pandas_oracle_every_epoch_pair(diff_engine):
    eng = diff_engine
    for lo, hi in [(1, 2), (2, 4), (1, 4), (3, 3)]:
        got = eng.state_diff(lo, hi).to_pandas().reset_index(drop=True)
        old = eng.state_at(lo, sort=True).to_pandas()
        new = eng.state_at(hi, sort=True).to_pandas()
        want = _pandas_state_diff(old, new)
        if len(got) == 0 and len(want) == 0:
            continue
        got["turn_idx"] = got["turn_idx"].astype("int64")
        want["turn_idx"] = want["turn_idx"].astype("int64")
        assert got.equals(want), f"diff {lo}->{hi} mismatch"


def test_state_diff_same_epoch_is_empty(diff_engine):
    assert diff_engine.state_diff(4, 4).count() == 0


def test_state_diff_kind_classification_unit():
    from nifi_processors_ray.pipelines.replay import _diff_sides

    def st(rows):
        return pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array([r[2] for r in rows], pa.string()),
                "text": pa.array([r[3] for r in rows], pa.string()),
                "tool": pa.array([r[4] for r in rows], pa.string()),
                "ts": pa.array([r[5] for r in rows], pa.timestamp("us")),
            }
        )

    old = st(
        [
            ("a", 0, "user", "hi", None, 1),       # unchanged
            ("a", 1, "assistant", "yo", None, 2),  # text updated
            ("b", 0, "user", "bye", "code", 3),    # deleted
            ("c", 0, "user", "t", None, None),     # null ts both → unchanged
        ]
    )
    new = st(
        [
            ("a", 0, "user", "hi", None, 1),
            ("a", 1, "assistant", "yo!", None, 2),
            ("c", 0, "user", "t", None, None),
            ("d", 0, "system", "new", None, 9),    # added
        ]
    )
    got = _diff_sides(old, new).to_pydict()
    assert got == {
        "conv_id": ["a", "b", "d"],
        "turn_idx": [1, 0, 0],
        "change_kind": ["updated", "deleted", "added"],
    }


def test_state_diff_tool_schema_evolution_sides():
    # an old snapshot that predates the `tool` column diffs cleanly:
    # tool NULL vs tool present is 'updated', NULL vs NULL is unchanged
    from nifi_processors_ray.pipelines.replay import _diff_sides

    old = pa.table(
        {
            "conv_id": pa.array(["a", "b"], pa.string()),
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": pa.array(["user", "user"], pa.string()),
            "text": pa.array(["x", "y"], pa.string()),
            "ts": pa.array([1, 2], pa.timestamp("us")),
        }
    )
    new = pa.table(
        {
            "conv_id": pa.array(["a", "b"], pa.string()),
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": pa.array(["user", "user"], pa.string()),
            "text": pa.array(["x", "y"], pa.string()),
            "tool": pa.array(["code", None], pa.string()),
            "ts": pa.array([1, 2], pa.timestamp("us")),
        }
    )
    got = _diff_sides(old, new).to_pydict()
    assert got == {"conv_id": ["a"], "turn_idx": [0], "change_kind": ["updated"]}


def test_hot_keys_matches_pandas_oracle_and_tiebreak(engine):
    eng, paths = engine
    got = eng.hot_keys(top_n=5).to_pandas().reset_index(drop=True)
    # pandas oracle over the raw valid log: counts per conv_id + op mix
    from nifi_processors_ray.stages.validate import validate_batch

    log = validate_batch(read_log(paths))
    valid = log.filter(pc.is_null(log.column("reject_reason"))).to_pandas()
    agg = (
        valid.assign(
            n_inserts=(valid["op"] == "I").astype("int64"),
            n_updates=(valid["op"] == "U").astype("int64"),
            n_deletes=(valid["op"] == "D").astype("int64"),
            n_changes=1,
        )
        .groupby("conv_id", as_index=False)[
            ["n_changes", "n_inserts", "n_updates", "n_deletes"]
        ]
        .sum()
        .sort_values(["n_changes", "conv_id"], ascending=[False, True])
        .head(5)
        .reset_index(drop=True)
    )
    assert got.columns.tolist() == [
        "conv_id", "n_changes", "n_inserts", "n_updates", "n_deletes",
    ]
    assert got.astype({"n_changes": "int64"}).equals(agg[got.columns.tolist()])


def test_hot_keys_empty_lake_is_schema_stable(tmp_path):
    lake = str(tmp_path / "lake")
    log = str(tmp_path / "log")
    import os as _os

    _os.makedirs(log, exist_ok=True)
    write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(lake, log, epoch_events=300)
    # no replay yet: nothing consumed, report must be empty with schema
    # (checked at the Dataset level — Ray's to_pandas drops the schema
    # of ANY all-empty Dataset, the quirk the early return exists for)
    got = eng.hot_keys()
    assert got.count() == 0
    assert got.schema().names == [
        "conv_id", "n_changes", "n_inserts", "n_updates", "n_deletes",
    ]
