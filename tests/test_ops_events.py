"""Stream-analytics operators vs DuckDB oracles + hand-built sessions."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from nifi_processors_ray.ops import events as EV

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')")
    return c


@pytest.mark.parametrize(
    "fn,sql",
    [
        (EV.window_agg, EV.WINDOW_AGG_SQL),
        (EV.sessionize, EV.SESSIONIZE_SQL),
        (EV.topk_users, EV.TOPK_USERS_SQL),
        (EV.distinct_types, EV.DISTINCT_TYPES_SQL),
    ],
    ids=["window_agg", "sessionize", "topk_users", "distinct_types"],
)
def test_events_op_matches_sql(con, fn, sql):
    got = fn(SF_DIR).to_pandas()
    want = con.sql(sql).df()
    a = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    b = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_sessionize_hand_example():
    us = 1_000_000
    tbl = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            # user 1: two events 10s apart, then one 31min later → 2 sessions
            "ts": pa.array(
                np.array([0, 10 * us, 10 * us + EV._SESSION_GAP_US + 1, 5 * us]),
                pa.timestamp("us"),
            ),
            "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        }
    )
    out = {r["user_id"]: r for r in EV._sessionize_block(tbl).to_pylist()}
    assert out[1]["n_sessions"] == 2 and out[1]["n_events"] == 3
    assert out[2]["n_sessions"] == 1 and out[2]["n_events"] == 1


def test_topk_deterministic_tiebreak():
    out = EV.topk_users(SF_DIR).to_pandas()
    assert len(out) == 10
    # sorted by (-value_cents, user_id)
    v = list(zip(-out["value_cents"], out["user_id"]))
    assert v == sorted(v)


def test_hopping_agg_each_event_in_two_windows(con):
    got = EV.hopping_agg(SF_DIR).to_pandas()
    want = con.sql(EV.HOPPING_AGG_SQL).df()
    assert got["n_events"].sum() == 2 * con.sql("SELECT COUNT(*) FROM events").fetchone()[0]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want[got.columns].reset_index(drop=True), check_dtype=False
    )


def test_hop_partials_hand_example():
    from nifi_processors_ray.ops.events import _HOP_US, _hop_partials

    t = pa.table(
        {
            "ts": pa.array([_HOP_US * 3 + 5, _HOP_US * 3 + 7], pa.timestamp("us")),
            "event_type": pa.array(["x", "x"]),
            "value": pa.array([1.0, 2.0]),
        }
    )
    out = _hop_partials(t).to_pandas().sort_values("window_idx")
    # both events fall in windows starting at hop index 2 and 3
    assert list(out["window_idx"]) == [2, 3]
    assert list(out["n_events"]) == [2, 2]
    assert list(out["value_cents"]) == [300, 300]


def test_type_pivot_partials_hand_example():
    batch = pa.table(
        {
            "user_id": pa.array([7, 7, 7, 9], pa.int64()),
            "event_type": pa.array(["click", "click", "mystery", "view"]),
        }
    )
    out = EV._pivot_partials(batch).to_pandas().set_index("user_id")
    assert out.loc[7, "n_click"] == 2
    # out-of-domain type: no pivot column, but COUNT(*) still sees it
    assert out.loc[7, "n_events"] == 3
    assert int(out.loc[7, [f"n_{t}" for t in EV.PIVOT_EVENT_TYPES]].sum()) == 2
    assert out.loc[9, "n_view"] == 1 and out.loc[9, "n_events"] == 1


def test_type_pivot_matches_sql(con):
    got = EV.type_pivot(SF_DIR).to_pandas()
    want = con.sql(EV.TYPE_PIVOT_SQL).df()
    a = got[sorted(got.columns)].reset_index(drop=True)
    b = want[sorted(want.columns)].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # pivot columns decompose the total exactly (domain covers this corpus)
    assert (
        got[[f"n_{t}" for t in EV.PIVOT_EVENT_TYPES]].sum(axis=1) == got["n_events"]
    ).all()


def test_stratified_sample_respects_rates(con):
    got = EV.stratified_sample(SF_DIR).to_pandas()
    # every surviving row satisfies its stratum's hash threshold
    rates = dict(EV.STRATA_RATES)
    eid = got["event_id"].to_numpy().astype(np.uint64) % np.uint64(4294967296)
    bucket = (eid * np.uint64(2654435761)) % np.uint64(4294967296) % np.uint64(100)
    thresh = got["event_type"].map(rates).to_numpy()
    assert (bucket.astype(np.int64) < thresh).all()
    # rare strata keep a larger share than decimated ones on this corpus
    full = con.sql("SELECT event_type, COUNT(*) n FROM events GROUP BY 1").df()
    kept = got.groupby("event_type").size()
    share = (kept / full.set_index("event_type")["n"]).dropna()
    if {"error", "click"} <= set(share.index):
        assert share["error"] > share["click"]


def test_moving_block_frame_and_lag():
    import numpy as np

    block = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "event_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
            "ts": pa.array(np.array([1, 2, 3, 4, 5], dtype="datetime64[us]")),
            "cents": pa.array([5, 7, 11, 13, 100], pa.int64()),
        }
    )
    out = EV._moving_block(block).to_pandas().set_index("event_id")
    # frame is ROWS 2 PRECEDING: [5], [5,7], [5,7,11], [7,11,13]
    assert out["w3_cents"].tolist() == [5, 12, 23, 31, 100]
    # lag delta NULL at each user's first row, including user 2's
    assert pd.isna(out.loc[10, "delta_cents"]) and pd.isna(out.loc[14, "delta_cents"])
    assert out.loc[12, "delta_cents"] == 4


def test_retention_block_dedups_and_counts_adjacency():
    block = pa.table(
        {
            # user 1: hours 5,5,6,8 (dup 5 collapses; 5→6 adjacent; 6→8 not)
            # user 2: hour 6 only; user 3: hours 6,7
            "user_id": pa.array([1, 1, 1, 1, 2, 3, 3], pa.int64()),
            "hour": pa.array([5, 5, 6, 8, 6, 7, 6], pa.int64()),
        }
    )
    out = EV._retention_block(block).to_pandas().set_index("hour")
    assert out.loc[5, "n_retained"] == 1  # user 1
    assert out.loc[6, "n_retained"] == 1  # user 3
    assert 7 not in out.index and 8 not in out.index


def test_moving_block_all_run_starts_keeps_int64_schema():
    """A block where every row is a run start (all-singleton users) must
    still emit delta_cents as int64-with-nulls, not Arrow null type —
    otherwise downstream schema unification fails (review finding)."""
    import numpy as np

    block = pa.table(
        {
            "user_id": pa.array([1, 2, 3], pa.int64()),
            "event_id": pa.array([10, 11, 12], pa.int64()),
            "ts": pa.array(np.array([1, 2, 3], dtype="datetime64[us]")),
            "cents": pa.array([5, 7, 11], pa.int64()),
        }
    )
    out = EV._moving_block(block)
    assert out.schema.field("delta_cents").type == pa.int64()
    assert out.column("delta_cents").null_count == 3
    normal = EV._moving_block(
        pa.table(
            {
                "user_id": pa.array([1, 1], pa.int64()),
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(np.array([1, 2], dtype="datetime64[us]")),
                "cents": pa.array([1, 2], pa.int64()),
            }
        )
    )
    pa.concat_tables([out, normal])  # must unify


def test_hash_samplers_reject_negative_ids():
    import numpy as np
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-negative"):
        EV._hash_ids(pa.array([3, -1], pa.int64()))
    # non-negative path unchanged
    assert EV._hash_ids(pa.array([0, 5], pa.int64())).tolist() == [0, 5]


def test_latest_partial_tie_breaks_on_event_id():
    """Equal ts → higher event_id wins, matching ORDER BY ts DESC,
    event_id DESC in the SQL twin."""
    import numpy as np

    b = pa.table(
        {
            "user_id": pa.array([7, 7, 7, 9], pa.int64()),
            "event_id": pa.array([3, 5, 4, 1], pa.int64()),
            "event_type": pa.array(["a", "b", "c", "d"]),
            "ts": pa.array(np.array([10, 20, 20, 5], dtype="datetime64[us]")),
            "value_cents": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    out = EV._latest_partial(b)
    assert out.column("user_id").to_pylist() == [7, 9]
    assert out.column("event_id").to_pylist() == [5, 1]  # ts tie → id 5 beats 4
    # idempotent: applying the combiner to its own output is a no-op
    again = EV._latest_partial(out)
    assert again.equals(out)


def test_latest_block_empty_keeps_schema():
    out = EV._latest_block(
        pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "ts": pa.array([], pa.timestamp("us")),
                "value_cents": pa.array([], pa.int64()),
            }
        )
    )
    assert out.num_rows == 0
    assert out.schema.field("value_cents").type == pa.int64()
    assert out.schema.field("ts").type == pa.timestamp("us")


def test_funnel_block_strict_ordering():
    """User 1 converts fully; user 2's click precedes its view (chain
    stops at view); user 3's view is simultaneous with signup (strict >
    rejects it)."""
    import numpy as np

    rows = [
        # user 1: signup@1, view@2, click@3, purchase@4 -> all 4 steps
        (1, "signup", 1), (1, "view", 2), (1, "click", 3), (1, "purchase", 4),
        # user 2: click@1 (too early), signup@2, view@3 -> steps 1,2 only
        (2, "click", 1), (2, "signup", 2), (2, "view", 3),
        # user 3: signup@5, view@5 (tie, strict > fails) -> step 1 only
        (3, "signup", 5), (3, "view", 5),
    ]
    b = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "ts": pa.array(np.array([r[2] for r in rows], dtype="datetime64[us]")),
        }
    )
    proj = EV._funnel_project(b)
    out = EV._funnel_block(proj)
    assert out.column("step").to_pylist() == [1, 2, 3, 4]
    assert out.column("n_users").to_pylist() == [3, 2, 1, 1]


def test_transition_partials_respects_run_boundaries():
    # user 1: a->b->a (transitions ab, ba); user 2: single event (none);
    # user 3: c->c (one self-transition). Rows arrive unsorted.
    block = pa.table(
        {
            "user_id": pa.array([1, 3, 1, 2, 1, 3], pa.int64()),
            "event_id": pa.array([10, 20, 11, 30, 12, 21], pa.int64()),
            "ts": pa.array([1, 1, 2, 1, 3, 2], pa.timestamp("us")),
            "event_type": pa.array(["a", "c", "b", "x", "a", "c"]),
        }
    )
    out = EV._transition_partials(block).sort_by(
        [("prev_type", "ascending"), ("next_type", "ascending")]
    )
    assert out.column("prev_type").to_pylist() == ["a", "b", "c"]
    assert out.column("next_type").to_pylist() == ["b", "a", "c"]
    assert out.column("n").to_pylist() == [1, 1, 1]


def test_transition_partials_empty_is_schema_stable():
    out = EV._transition_partials(
        pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "event_type": pa.array([], pa.string()),
            }
        )
    )
    assert out.num_rows == 0
    assert out.schema.names == ["prev_type", "next_type", "n"]


def test_hist_partials_buckets_and_sums():
    batch = pa.table({"value": pa.array([0.01, 9.99, 10.00, 25.50], pa.float64())})
    out = EV._hist_partials(batch).sort_by("bucket")
    # cents: 1, 999, 1000, 2550 -> buckets 0, 0, 1, 2
    assert out.column("bucket").to_pylist() == [0, 1, 2]
    assert out.column("n_events").to_pylist() == [2, 1, 1]
    assert out.column("sum_cents").to_pylist() == [1000, 1000, 2550]


def test_hourly_dense_zero_fills_gaps(ray_session):
    dense = EV.hourly_dense(SF_DIR)
    hours = dense.column("hour").to_pylist()
    counts = dense.column("n_events").to_pylist()
    # spine is contiguous and spans min..max
    assert hours == list(range(hours[0], hours[-1] + 1))
    # endpoints are real observations (non-zero by construction)
    assert counts[0] > 0 and counts[-1] > 0
    assert sum(counts) == duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()[0]


def test_role_transitions_block_skips_null_prev():
    from nifi_processors_ray.pipelines import conversations as C

    block = pa.table(
        {
            "conv_id": pa.array(["c1"] * 4),
            "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
            "role": pa.array(["user", None, "assistant", "user"]),
        }
    )
    out = C.role_transitions_block(block).sort_by(
        [("prev_role", "ascending"), ("next_role", "ascending")]
    )
    # steps: user->NULL kept (prev non-null), NULL->assistant dropped,
    # assistant->user kept
    assert out.column("prev_role").to_pylist() == ["assistant", "user"]
    assert out.column("next_role").to_pylist() == ["user", None]


def test_transition_partials_null_users_form_one_partition():
    # SQL LAG ... PARTITION BY user_id puts all NULL user_ids in ONE
    # partition; the kernel must count their steps, not NaN-split them
    block = pa.table(
        {
            "user_id": pa.array([None, None, 1], pa.int64()),
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([1, 2, 1], pa.timestamp("us")),
            "event_type": pa.array(["a", "b", "c"]),
        }
    )
    out = EV._transition_partials(block)
    assert out.column("prev_type").to_pylist() == ["a"]
    assert out.column("next_type").to_pylist() == ["b"]
    assert out.column("n").to_pylist() == [1]


def test_user_gaps_block_single_event_and_runs():
    block = pa.table(
        {
            "user_id": pa.array([2, 1, 1, 1], pa.int64()),
            "event_id": pa.array([9, 1, 2, 3], pa.int64()),
            "ts": pa.array([100, 10, 40, 45], pa.timestamp("us")),
        }
    )
    out = EV._user_gaps_block(block)
    assert out.column("user_id").to_pylist() == [1, 2]
    assert out.column("n_events").to_pylist() == [3, 1]
    assert out.column("max_gap_us").to_pylist() == [30, 0]  # single event -> 0
    assert out.column("sum_gap_us").to_pylist() == [35, 0]


def test_modal_block_tie_breaks_lexicographically():
    """Equal counts → lexicographically smallest type wins (the SQL
    twin's row_number order); null types lose every tie (NULLS LAST)."""
    import pyarrow as pa
    from nifi_processors_ray.ops.events import _modal_block

    block = pa.table(
        {
            "user_id": pa.array([7, 7, 7, 8, 8, None], pa.int64()),
            "event_type": pa.array(["view", "click", "click", None, "zzz", "purchase"]),
            "n": pa.array([2, 1, 1, 3, 3, 5], pa.int64()),
        }
    )
    out = _modal_block(block).to_pydict()
    got = dict(zip(out["user_id"], zip(out["modal_type"], out["n"])))
    assert got[7] == ("click", 2)  # click partials fold to 2, tying view → 'click' < 'view'
    assert got[8] == ("zzz", 3)    # null type loses the tie to a real type
    assert got[None] == ("purchase", 5)  # null users form ONE group


def test_first_last_null_ts_matches_duckdb():
    """A null-ts row must never win 'last' while non-null rows exist
    (DuckDB default NULLS LAST in both directions); all-null users fall
    back to event_id order — exact kernel-vs-DuckDB parity."""
    import duckdb
    import pyarrow as pa
    from nifi_processors_ray.ops.events import (
        FIRST_LAST_SQL,
        _first_last_block,
        _first_last_partial,
    )

    events = pa.table(
        {
            "user_id": pa.array([5, 5, 5, 6, 6, 7], pa.int64()),
            "event_type": pa.array(["a", "b", "c", "x", "y", "z"]),
            "ts": pa.array(
                [1_000, None, 500, None, None, None], pa.timestamp("us")
            ),
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        }
    )
    got = (
        _first_last_block(_first_last_partial(events))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", events)
    want = con.sql(FIRST_LAST_SQL).df().reset_index(drop=True)
    got = got[want.columns.tolist()]
    assert got.equals(want), f"\ngot:\n{got}\nwant:\n{want}"


def test_props_extract_malformed_payloads_match_duckdb(ray_session):
    """Null, non-JSON, no-k and negative-k payloads: extraction yields
    NULL (dropped by the route) or the typed value, exactly like the
    twin's TRY_CAST(regexp_extract(...))."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    from nifi_processors_ray.ops.events import PROPS_EXTRACT_SQL, _props_extract_batch

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "event_type": pa.array(["a"] * 6, pa.string()),
            "props": pa.array(
                ['{"k": 95}', None, "not json", '{"other": 1}', '{"k": -99}', '{"k": 90}'],
                pa.string(),
            ),
        }
    )
    eng = _props_extract_batch(t).to_pandas()
    con = duckdb.connect()
    con.register("events", t.to_pandas())
    ora = con.sql(PROPS_EXTRACT_SQL).df()
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ora.reset_index(drop=True), check_dtype=False
    )
    assert eng.event_id.tolist() == [1, 6]


def test_conversions_within_tie_does_not_shadow_earlier_click():
    """The equal-ts corner the kernel's tie-break sort exists for: a
    click tied exactly with the purchase must not SHADOW an earlier
    in-window click (SQL EXISTS would still find the earlier one), and
    a tied click alone is NOT a conversion (strict c.ts < p.ts)."""
    import numpy as np
    import pyarrow as pa

    from nifi_processors_ray.ops.events import _conv_block

    W = 1_800_000_000
    rows = [
        # user 1: click t-10s, click t (tie), purchase t  -> converts
        (1, 1_000_000_000_000, 1), (1, 1_000_000_000_000 + W // 2 - 10_000_000, 1),
        (1, 1_000_000_000_000 + W // 2, 1), (1, 1_000_000_000_000 + W // 2, 0),
        # user 2: ONLY a tied click at the purchase ts     -> no conversion
        (2, 5_000_000_000_000, 1), (2, 5_000_000_000_000, 0),
        # user 3: click exactly W before purchase          -> boundary is strict, no
        (3, 9_000_000_000_000, 1), (3, 9_000_000_000_000 + W, 0),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts_us": pa.array([r[1] for r in rows], pa.int64()),
            "is_x": pa.array([r[2] for r in rows], pa.int8()),
        }
    )
    out = _conv_block(t)
    assert out.to_pydict() == {"user_id": [1], "n_conversions": [1]}


# ---------------------------------------------------------------------------
# grouped exact MAD: finalize-kernel calibration against DuckDB mad()
# ---------------------------------------------------------------------------


def _mad_hist(rows):
    """Build the (event_type, value_cents, n) histogram block _mad_finalize
    consumes from raw (type, cents) rows — cents None allowed."""
    import collections

    c = collections.Counter(rows)
    return pa.table(
        {
            "event_type": pa.array([k[0] for k in c], pa.string()),
            "value_cents": pa.array([k[1] for k in c], pa.int64()),
            "n": pa.array(list(c.values()), pa.int64()),
        }
    )


@pytest.mark.parametrize(
    "cents",
    [
        [1, 2, 4, 10],          # even n, interpolated both passes
        [1, 2, 4],              # odd n
        [5],                    # single value -> 0.0
        [7, 7, 7, 7],           # zero dispersion
        [-10, -3, 0, 4, 4],     # negatives + duplicates
        [0, 1, 2, 100],         # outlier, .5 median then .25-step result
        [1, None, 4],           # null skipped by mad, counted by COUNT(*)
        [None, None],           # all-null group -> NULL mad
        list(range(-50, 50)) + [25] * 30,  # weighted duplicates
    ],
)
def test_mad_finalize_matches_duckdb(cents):
    block = _mad_hist([("t", c) for c in cents])
    got = EV._mad_finalize(block).to_pydict()
    vals = [(c,) for c in cents]
    con = duckdb.connect()
    exp = con.execute(
        "SELECT mad(x), CAST(COUNT(*) AS BIGINT) FROM (SELECT * FROM (VALUES "
        + ",".join("(CAST(? AS BIGINT))" for _ in vals)
        + ") v(x)) t",
        [c for (c,) in vals],
    ).fetchone()
    assert got["n_events"] == [exp[1]]
    if exp[0] is None:
        assert got["mad_cents"] == [None]
    else:
        assert got["mad_cents"][0] == float(exp[0])


def test_mad_finalize_multi_group_and_null_type():
    rows = [("a", 1), ("a", 2), (None, 3), (None, 30), ("b", None)]
    out = EV._mad_finalize(_mad_hist(rows)).to_pydict()
    by = dict(zip(out["event_type"], out["mad_cents"]))
    assert by["a"] == 0.5
    assert by[None] == 13.5
    assert by["b"] is None


def test_mad_empty_block_schema():
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "value_cents": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )
    out = EV._mad_finalize(empty)
    assert out.num_rows == 0
    assert out.schema.names == ["event_type", "mad_cents", "n_events"]
