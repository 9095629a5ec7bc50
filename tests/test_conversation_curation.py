"""Unit oracles for the transcript-curation ops (dedup_conversations,
chat_training_mix) on crafted corpora — independent of the CDC replay
path and of the planted-clone augmentation (ids here avoid the
CLONE_MOD rule, so what the kernels see is exactly what's crafted).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from nifi_processors_ray.pipelines.conversations import (
    MIX_MIN_TOKENS,
    chat_training_mix,
    dedup_conversations,
)


def _transcripts(rows) -> ray.data.Dataset:
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array([0] * len(rows), pa.timestamp("us")),
        }
    )
    return ray.data.from_arrow(t)


def test_dedup_conversations_merges_identical_transcripts(ray_session):
    # c1 and c2 are byte-identical conversations; c3 differs only in role.
    rows = [
        ("c1", 0, "user", "hello there", None),
        ("c1", 1, "assistant", "hi", None),
        ("c2", 0, "user", "hello there", None),
        ("c2", 1, "assistant", "hi", None),
        ("c3", 0, "system", "hello there", None),
        ("c3", 1, "assistant", "hi", None),
    ]
    out = dedup_conversations(_transcripts(rows)).to_pandas()
    got = {r.conv_id: (r.n_turns, r.n_copies) for r in out.itertuples()}
    assert got == {"c1": (2, 2), "c3": (2, 1)}


def test_dedup_conversations_turn_order_is_identity(ray_session):
    # Same turn texts in a different turn order = a DIFFERENT conversation.
    rows = [
        ("c1", 0, "user", "a", None),
        ("c1", 1, "assistant", "b", None),
        ("c2", 0, "user", "b", None),
        ("c2", 1, "assistant", "a", None),
    ]
    out = dedup_conversations(_transcripts(rows)).to_pandas()
    assert sorted(out.conv_id) == ["c1", "c2"]
    assert (out.n_copies == 1).all()


def test_chat_training_mix_budget_and_gates(ray_session):
    # Tokens per turn under the BPE-ish tokenizer: "w" * k → k word tokens.
    def turns(conv, n_tok, tool):
        return [(conv, 0, "user", " ".join(["w"] * n_tok), tool)]

    rows = (
        turns("c1", MIX_MIN_TOKENS + 40, "search")  # 100 tokens, has tool
        + turns("c2", MIX_MIN_TOKENS + 20, "search")  # 80 tokens, has tool
        + turns("c3", MIX_MIN_TOKENS, "search")  # 60 tokens, has tool
        + turns("c4", MIX_MIN_TOKENS - 1, "search")  # gated: too thin
        + turns("c5", MIX_MIN_TOKENS + 100, None)  # gated: no tool turn
    )
    out = chat_training_mix(_transcripts(rows)).to_pandas()
    # gated corpus = {c1:100, c2:80, c3:60} → budget = 240 // 2 = 120.
    # Fill order (tokens DESC): c1 starts at 0 (< 120, kept), c2 starts
    # at 100 (< 120, kept), c3 starts at 180 (dropped).
    assert out.conv_id.tolist() == ["c1", "c2"]
    assert out.cum_tokens.tolist() == [100, 180]
    assert out.bpe_tokens.tolist() == [100, 80]


def test_chat_training_mix_empty_gate_is_schema_stable(ray_session):
    rows = [("c1", 0, "user", "too thin", None)]
    out = chat_training_mix(_transcripts(rows)).to_pandas()
    assert len(out) == 0
    assert list(out.columns) == ["conv_id", "n_turns", "bpe_tokens", "cum_tokens"]


# ---------------------------------------------------------------------------
# reply latency: block-kernel edge semantics vs the twin's contract
# ---------------------------------------------------------------------------


def _rl_block(rows):
    from nifi_processors_ray.pipelines.conversations import reply_latency_block

    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        }
    )
    return reply_latency_block(t).to_pydict()


def test_reply_latency_basic_and_order_independent():
    rows = [
        ("c1", 1, "assistant", 1_500_000),
        ("c1", 0, "user", 1_000_000),      # gap 0.5 s
        ("c1", 2, "user", 2_000_000),
        ("c1", 3, "assistant", 5_000_000), # gap 3 s
        ("c2", 0, "assistant", 0),          # no user before → no row
        ("c2", 1, "user", 1),
    ]
    got = _rl_block(rows)
    assert got == {
        "conv_id": ["c1"],
        "n_replies": [2],
        "total_reply_us": [3_500_000],
        "max_reply_us": [3_000_000],
    }


def test_reply_latency_null_ts_counts_step_not_gap():
    # a qualifying step with a null ts on either side: the step exists
    # (the row is emitted) but COUNT(gap)/SUM/MAX skip the null gap
    rows = [
        ("c", 0, "user", None),
        ("c", 1, "assistant", 10),
    ]
    got = _rl_block(rows)
    assert got == {
        "conv_id": ["c"],
        "n_replies": [0],
        "total_reply_us": [None],
        "max_reply_us": [None],
    }


def test_reply_latency_conv_boundary_and_null_roles():
    # last turn of c1 is 'user', first of c2 'assistant' — adjacency
    # across conversations must NOT pair; null roles never qualify
    rows = [
        ("c1", 0, "user", 0),
        ("c2", 0, "assistant", 5),
        ("c2", 1, None, 10),
        ("c2", 2, "assistant", 20),
    ]
    assert _rl_block(rows)["conv_id"] == []


def test_reply_latency_matches_duckdb_on_random_blocks():
    import duckdb
    import numpy as np

    rng = np.random.default_rng(11)
    roles = ["user", "assistant", "system", "tool", None]
    rows = []
    for c in range(30):
        for t in range(int(rng.integers(1, 12))):
            ts = None if rng.random() < 0.1 else int(rng.integers(0, 10**9))
            rows.append((f"c{c:03d}", t, roles[int(rng.integers(0, 5))], ts))
    got = pd.DataFrame(_rl_block(rows))
    con = duckdb.connect()
    con.register(
        "state",
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array([r[2] for r in rows], pa.string()),
                "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            }
        ),
    )
    want = con.sql(
        """
        WITH steps AS (
          SELECT conv_id, role AS next_role,
                 LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role,
                 epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap_us
          FROM state)
        SELECT conv_id, CAST(COUNT(gap_us) AS BIGINT) AS n_replies,
               CAST(SUM(gap_us) AS BIGINT) AS total_reply_us,
               CAST(MAX(gap_us) AS BIGINT) AS max_reply_us
        FROM steps WHERE prev_role = 'user' AND next_role = 'assistant'
        GROUP BY conv_id ORDER BY conv_id
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_turn_gaps_detects_holes_and_nonzero_start(ray_session):
    from nifi_processors_ray.pipelines.conversations import turn_gaps

    t = pa.table(
        {
            "conv_id": pa.array(
                ["full", "full", "full", "holey", "holey", "late"], pa.string()
            ),
            "turn_idx": pa.array([0, 1, 2, 0, 5, 3], pa.int32()),
        }
    )
    got = turn_gaps(ray.data.from_arrow(t)).to_pandas()
    # 'full' is contiguous -> absent; 'holey' misses 4 of 0..5; a
    # conversation starting late ('late', first turn 3) misses 0..2
    assert got.set_index("conv_id")["n_missing"].to_dict() == {"holey": 4, "late": 3}


def test_tool_profile_counts_calls_and_distinct_convs(ray_session):
    from nifi_processors_ray.pipelines.conversations import tool_profile

    t = pa.table(
        {
            "conv_id": pa.array(
                ["a", "a", "a", "b", "b", None, "c"], pa.string()
            ),
            "tool": pa.array(
                ["search", "search", "python", "search", None, "search", None],
                pa.string(),
            ),
        }
    )
    got = (
        tool_profile(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("tool")
        .to_dict("index")
    )
    # 'search': 4 calls across convs {a, b, NULL-conv}; COUNT(DISTINCT
    # conv_id) skips the null conv → 2.  Null tool rows never appear.
    assert got == {
        "search": {"n_calls": 4, "n_convs": 2},
        "python": {"n_calls": 1, "n_convs": 1},
    }


def test_tool_transitions_skip_non_tool_turns_and_conv_boundaries(ray_session):
    from nifi_processors_ray.pipelines.conversations import tool_transitions

    rows = [
        # conv a: search → (plain turn) → python → search
        ("a", 0, "search"),
        ("a", 1, None),
        ("a", 2, "python"),
        ("a", 3, "search"),
        # conv b: single tool call; must not pair with conv a's last
        ("b", 0, "browser"),
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "tool": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    got = tool_transitions(ray.data.from_arrow(t)).to_pandas()
    pairs = {
        (r.prev_tool, r.next_tool): r.n for r in got.itertuples(index=False)
    }
    assert pairs == {("search", "python"): 1, ("python", "search"): 1}


def test_tool_profile_matches_duckdb_on_random_blocks(ray_session):
    """Randomized oracle for the tool-profile pipeline: null tools, null
    conv_ids, repeated (tool, conv) pairs — engine == DuckDB."""
    import duckdb
    import numpy as np

    from nifi_processors_ray.pipelines.conversations import tool_profile

    rng = np.random.default_rng(23)
    tools = ["search", "python", "browser", None, None, None]
    convs = [f"c{i}" for i in range(12)] + [None]
    rows = [
        (convs[int(rng.integers(0, len(convs)))], tools[int(rng.integers(0, len(tools)))])
        for _ in range(400)
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "tool": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    got = tool_profile(ray.data.from_arrow(t)).to_pandas()
    con = duckdb.connect()
    con.register("state", t)
    want = con.sql(
        """
        SELECT tool, CAST(COUNT(*) AS BIGINT) AS n_calls,
               CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs
        FROM state WHERE tool IS NOT NULL
        GROUP BY tool ORDER BY tool
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_tool_transitions_match_duckdb_on_random_blocks(ray_session):
    """Randomized oracle for the tool-transition pipeline: sparse tool
    turns, null conv_ids, unordered input — engine == DuckDB."""
    import duckdb
    import numpy as np

    from nifi_processors_ray.pipelines.conversations import tool_transitions

    rng = np.random.default_rng(29)
    tools = ["search", "python", "browser", None, None]
    rows = []
    for c in list(range(15)) + [None]:
        cid = f"c{c:02d}" if c is not None else None
        turns = list(range(int(rng.integers(1, 10))))
        rng.shuffle(turns)  # input order must not matter
        for t_idx in turns:
            rows.append((cid, t_idx, tools[int(rng.integers(0, len(tools)))]))
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "tool": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    got = tool_transitions(ray.data.from_arrow(t)).to_pandas()
    con = duckdb.connect()
    con.register("state", t)
    want = con.sql(
        """
        WITH s AS (SELECT conv_id, turn_idx, tool FROM state WHERE tool IS NOT NULL),
        steps AS (
          SELECT tool AS next_tool,
                 LAG(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_tool
          FROM s)
        SELECT prev_tool, next_tool, CAST(COUNT(*) AS BIGINT) AS n
        FROM steps WHERE prev_tool IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_daily_activity_matches_duckdb_incl_pre_1970(ray_session):
    """Randomized oracle for the daily-activity rollup, including
    negative (pre-1970) epochs — floor-division day buckets must agree
    with DuckDB's BIGINT // toward -inf, and null ts rows are excluded."""
    import duckdb
    import numpy as np

    from nifi_processors_ray.pipelines.conversations import daily_activity

    rng = np.random.default_rng(31)
    us = [
        None if rng.random() < 0.1
        else int(rng.integers(-3 * 86_400_000_000, 3 * 86_400_000_000))
        for _ in range(500)
    ]
    t = pa.table(
        {
            "conv_id": pa.array(
                [f"c{int(rng.integers(0, 20))}" if rng.random() > 0.05 else None
                 for _ in range(500)],
                pa.string(),
            ),
            "ts": pa.array(us, pa.timestamp("us")),
        }
    )
    got = daily_activity(ray.data.from_arrow(t)).to_pandas()
    con = duckdb.connect()
    con.register("state", t)
    want = con.sql(
        """
        SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_turns,
               CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs
        FROM state WHERE ts IS NOT NULL
        GROUP BY day ORDER BY day
        """
    ).df()
    assert (got["day"] < 0).any(), "fixture must exercise pre-1970 buckets"
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )
