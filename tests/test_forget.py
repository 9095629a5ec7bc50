"""Targeted erasure (``CdcEngine.forget_conversations``): the
right-to-be-forgotten lifecycle op.

Invariants pinned here:
- erased conversations vanish from ``final_state`` and the point
  lookup, everything else is untouched (oracle = naive applier minus
  the erased ids);
- a second forget of the same ids is a no-op (keys re-enumerated from
  live state → nothing to erase → no commit);
- erasure works identically under merge-on-read (tombstones in deltas);
- time travel to the pre-erasure epoch still shows the conversation
  (snapshot isolation) until snapshots expire.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from nifi_processors_ray.oracle import apply_changelog
from nifi_processors_ray.synth import write_changelog_from_events

from test_replay_e2e import SF_DIR, make_engine, read_log

FORGET = ("c0", "c3")


def _erased_oracle(paths):
    state = apply_changelog(read_log(paths))
    keep = pc.invert(
        pc.is_in(state.column("conv_id"), value_set=pa.array(FORGET, pa.string()))
    )
    return state.filter(keep)


@pytest.fixture(scope="module", params=["cow", "mor"])
def erased(request, tmp_path_factory):
    lake = str(tmp_path_factory.mktemp(f"lake_{request.param}"))
    log = str(tmp_path_factory.mktemp("log"))
    paths = write_changelog_from_events(SF_DIR, log, files=3)
    kwargs = {"merge_mode": request.param}
    if request.param == "mor":
        kwargs.update(epoch_events=300, compact_threshold=3)
    eng = make_engine(lake, log, **kwargs)
    eng.replay()
    pre_epoch = eng.store.latest().epoch
    res = eng.forget_conversations(FORGET)
    return eng, paths, pre_epoch, res


def test_forget_removes_only_the_targets(ray_session, erased):
    eng, paths, _, res = erased
    assert res is not None and res.n_applied > 0
    got = eng.final_state(sort=True).to_pandas().reset_index(drop=True)
    want = _erased_oracle(paths).to_pandas().reset_index(drop=True)
    assert got.equals(want)
    assert not set(FORGET) & set(got["conv_id"])


def test_forget_point_lookup_empty(ray_session, erased):
    eng, *_ = erased
    assert eng.read_conversation("c0").count() == 0


def test_forget_twice_is_noop(ray_session, erased):
    eng, _, _, _ = erased
    before = eng.store.latest().epoch
    assert eng.forget_conversations(FORGET) is None
    assert eng.store.latest().epoch == before


def test_forget_unknown_conversation_is_noop(ray_session, erased):
    eng, *_ = erased
    assert eng.forget_conversations(("zz_never_existed",)) is None


def test_pre_erasure_snapshot_still_has_the_rows(ray_session, erased):
    eng, _, pre_epoch, _ = erased
    old = eng.state_at(pre_epoch, sort=True).to_pandas()
    assert "c0" in set(old["conv_id"])


def test_forget_does_not_consume_stream_seqs(ray_session, tmp_path):
    """The round-3 review finding: erasure must NOT advance the stream
    watermark — the very next contiguous log seq has to be applied after
    a forget.  Standard-CDC recreate semantics: a later event for an
    erased key re-creates THAT row only; previously erased turns stay
    gone."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    lake = str(tmp_path / "lake")
    log = str(tmp_path / "log")
    paths = write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(lake, log)
    eng.replay()
    head = max(eng.store.latest().watermarks.values())
    assert eng.forget_conversations(("c0",)) is not None
    # watermark untouched by the erasure commit
    assert max(eng.store.latest().watermarks.values()) == head

    # the producer appends the NEXT CONTIGUOUS seqs: one update for an
    # untouched conversation, one for the erased conversation
    seg = pa.table(
        {
            "op": pa.array(["U", "U"]),
            "conv_id": pa.array(["c2", "c0"]),
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": pa.array(["user", "user"]),
            "text": pa.array(["post-forget text", "resurrection attempt"]),
            "tool": pa.array([None, None], pa.string()),
            "ts": pa.array([0, 0], pa.timestamp("us")),
            "seq": pa.array([head + 1, head + 2], pa.int64()),
            "batch_id": pa.array(["late", "late"]),
        }
    )
    pq.write_table(seg, f"{log}/changelog-00099.parquet")
    eng.log_infos(refresh=True)
    res = eng.replay()
    assert res and sum(r.n_applied for r in res) >= 1

    state = eng.final_state(sort=True).to_pandas()
    # seq head+1 (the event a watermark bump would have skipped) applied:
    c2 = state[(state.conv_id == "c2") & (state.turn_idx == 0)]
    assert list(c2.text) == ["post-forget text"]
    # standard CDC: the late event re-creates ONLY its own row; every
    # other previously erased turn stays gone
    c0 = state[state.conv_id == "c0"]
    assert list(c0.turn_idx) == [0]
    assert list(c0.text) == ["resurrection attempt"]


def test_forget_crash_before_commit_changes_nothing(ray_session, tmp_path, monkeypatch):
    """Erasure inherits the 2PC contract: a failure BEFORE the manifest
    commit leaves the lake byte-for-byte at the prior state (staged
    files are orphans the next commit's paths overwrite), and the retry
    succeeds idempotently."""
    from nifi_processors_ray.pipelines.replay import CdcEngine

    lake = str(tmp_path / "lake")
    log = str(tmp_path / "log")
    write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(lake, log)
    eng.replay()
    before = eng.final_state(sort=True).to_pandas()
    before_epoch = eng.store.latest().epoch

    def boom(*a, **k):
        raise RuntimeError("injected pre-commit crash")

    monkeypatch.setattr(eng, "_commit", boom)
    with pytest.raises(RuntimeError, match="injected"):
        eng.forget_conversations(("c0",))
    monkeypatch.undo()

    # nothing committed: same epoch, same state, c0 still present
    assert eng.store.latest().epoch == before_epoch
    mid = eng.final_state(sort=True).to_pandas()
    assert mid.equals(before)
    # the retry completes the erasure
    assert eng.forget_conversations(("c0",)) is not None
    after = eng.final_state(sort=True).to_pandas()
    assert "c0" not in set(after["conv_id"])
    assert after.equals(before[before.conv_id != "c0"].reset_index(drop=True))
