"""Property tests for the vectorized per-block kernels against naive
references (pandas/python loops).  These kernels replaced per-row /
per-group Python in round 2; the properties pin their semantics across
randomized inputs (derandomized for CI stability).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

SETTINGS = settings(max_examples=40, deadline=None, derandomize=True)


# ---------------------------------------------------------------------------
# as-of join kernel
# ---------------------------------------------------------------------------

@SETTINGS
@given(seed=st.integers(0, 10_000), n_orders=st.integers(0, 60), n_events=st.integers(0, 80))
def test_asof_batch_matches_naive(seed, n_orders, n_events):
    from nifi_processors_ray.ops.relational import _asof_batch, build_asof_index

    rng = np.random.default_rng(seed)
    orders = pa.table(
        {
            "o_custkey": pa.array(rng.integers(0, 8, n_orders), pa.int64()),
            "o_orderdate": pa.array(rng.integers(0, 50, n_orders), pa.int64()).cast(
                pa.timestamp("us")
            ),
            "o_orderkey": pa.array(rng.permutation(n_orders).astype(np.int64)),
        }
    )
    batch = pa.table(
        {
            "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 10, n_events), pa.int64()),
            "ts": pa.array(rng.integers(0, 60, n_events), pa.int64()).cast(pa.timestamp("us")),
        }
    )
    got = _asof_batch(batch, build_asof_index(orders)).to_pylist()

    od = orders.to_pylist()
    events = batch.to_pylist()
    for row, ev in zip(got, events):
        cands = [
            (o["o_orderdate"], o["o_orderkey"])
            for o in od
            if o["o_custkey"] == ev["user_id"] and o["o_orderdate"] <= ev["ts"]
        ]
        expected = max(cands)[1] if cands else None
        assert row["last_orderkey"] == expected


# ---------------------------------------------------------------------------
# shuffle-join block kernel
# ---------------------------------------------------------------------------

@SETTINGS
@given(seed=st.integers(0, 10_000), n_orders=st.integers(0, 30), n_items=st.integers(0, 80))
def test_join_block_partials_match_pandas(seed, n_orders, n_items):
    from nifi_processors_ray.ops.joins import _join_block_partials

    rng = np.random.default_rng(seed)
    okeys = rng.choice(100, size=n_orders, replace=False).astype(np.int64)
    prios = rng.choice(["HI", "MED", "LO"], size=n_orders)
    ikeys = rng.choice(100, size=n_items).astype(np.int64)
    cents = rng.integers(0, 1000, n_items).astype(np.int64)
    # probe rows are combiner PARTIALS: each folds n in [1..5] lineitems —
    # exercises the weighted count path, not just the degenerate n=1 case
    ns = rng.integers(1, 6, n_items).astype(np.int64)

    block = pa.table(
        {
            "key": pa.array(np.concatenate([okeys, ikeys])),
            "side": pa.array(
                np.concatenate([np.zeros(n_orders, np.int8), np.ones(n_items, np.int8)])
            ),
            "priority": pa.array(list(prios) + [None] * n_items, pa.string()),
            "cents": pa.array([None] * n_orders + list(cents), pa.int64()),
            "n": pa.array([None] * n_orders + list(ns), pa.int64()),
        }
    )
    got = (
        _join_block_partials(block)
        .to_pandas()
        .sort_values("priority")
        .reset_index(drop=True)
    )

    odf = pd.DataFrame({"key": okeys, "priority": prios})
    idf = pd.DataFrame({"key": ikeys, "cents": cents, "n": ns})
    j = idf.merge(odf, on="key")
    if len(j) == 0:
        assert len(got) == 0
        return
    want = (
        j.groupby("priority")
        .agg(n_items=("n", "sum"), revenue_cents=("cents", "sum"))
        .reset_index()
        .sort_values("priority")
        .reset_index(drop=True)
    )
    assert got["priority"].tolist() == want["priority"].tolist()
    assert got["n_items"].tolist() == want["n_items"].tolist()
    assert got["revenue_cents"].tolist() == want["revenue_cents"].tolist()


# ---------------------------------------------------------------------------
# top-N rank kernel
# ---------------------------------------------------------------------------

@SETTINGS
@given(seed=st.integers(0, 10_000), n=st.integers(0, 100), n_top=st.integers(1, 5))
def test_rank_block_matches_pandas(seed, n, n_top):
    from nifi_processors_ray.ops.joins import _rank_block

    rng = np.random.default_rng(seed)
    block = pa.table(
        {
            "o_custkey": pa.array(rng.integers(0, 10, n), pa.int64()),
            "o_orderkey": pa.array(rng.permutation(n).astype(np.int64)),
            "price_cents": pa.array(rng.integers(0, 50, n), pa.int64()),
        }
    )
    got = _rank_block(block, n_top=n_top).to_pandas()

    df = block.to_pandas()
    df["rn"] = (
        df.sort_values(["price_cents", "o_orderkey"], ascending=[False, True])
        .groupby("o_custkey")
        .cumcount()
        + 1
    )
    want = df[df["rn"] <= n_top].sort_values(["o_custkey", "rn"]).reset_index(drop=True)
    got = got.sort_values(["o_custkey", "rn"]).reset_index(drop=True)
    assert got.equals(want[got.columns.tolist()])


# ---------------------------------------------------------------------------
# window finalize kernel (incl. null values)
# ---------------------------------------------------------------------------

@SETTINGS
@given(seed=st.integers(0, 10_000), n=st.integers(0, 120))
def test_window_pipeline_matches_pandas(seed, n):
    from nifi_processors_ray.ops.events import (
        _add_window_and_cents,
        _window_finalize,
        _window_partials,
    )

    rng = np.random.default_rng(seed)
    vals = rng.uniform(0, 100, n)
    nulls = rng.random(n) < 0.15
    batch = pa.table(
        {
            "ts": pa.array(rng.integers(0, 4 * 3_600_000_000, n).astype(np.int64)).cast(
                pa.timestamp("us")
            ),
            "event_type": pa.array(rng.choice(["a", "b"], n)),
            "value": pa.array([None if m else float(v) for v, m in zip(vals, nulls)], pa.float64()),
            "user_id": pa.array(rng.integers(0, 6, n), pa.int64()),
        }
    )
    # split into 2 partial batches (simulating separate map tasks), then merge
    t = _add_window_and_cents(batch)
    p1, p2 = _window_partials(t.slice(0, n // 2)), _window_partials(t.slice(n // 2))
    merged = pa.concat_tables([p1, p2]).sort_by(
        [("window_hour", "ascending"), ("event_type", "ascending")]
    )
    got = _window_finalize(merged).to_pandas().reset_index(drop=True)

    df = t.to_pandas()
    if len(df) == 0:
        assert len(got) == 0
        return
    want = (
        df.groupby(["window_hour", "event_type"])
        .agg(
            n_events=("user_id", "size"),
            # SQL SUM over an all-null group is NULL, else skips nulls
            value_cents=(
                "value_cents",
                lambda s: None if s.dropna().empty else int(s.dropna().sum()),
            ),
            n_users=("user_id", "nunique"),
        )
        .reset_index()
        .sort_values(["window_hour", "event_type"])
        .reset_index(drop=True)
    )
    got = got.sort_values(["window_hour", "event_type"]).reset_index(drop=True)
    for c in ("window_hour", "n_events", "n_users"):
        assert got[c].astype("int64").tolist() == want[c].astype("int64").tolist(), c
    a = [None if pd.isna(x) else int(x) for x in got["value_cents"]]
    b = [None if pd.isna(x) else int(x) for x in want["value_cents"]]
    assert a == b


# ---------------------------------------------------------------------------
# grouped quantiles vs DuckDB
# ---------------------------------------------------------------------------

@SETTINGS
@given(seed=st.integers(0, 10_000), n=st.integers(1, 120))
def test_quantile_pipeline_matches_duckdb(seed, n):
    import duckdb

    from nifi_processors_ray.ops.events import _quantile_finalize, _quantile_partials

    rng = np.random.default_rng(seed)
    vals = rng.uniform(0, 20, n)
    nulls = rng.random(n) < 0.1
    batch = pa.table(
        {
            "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
            "value": pa.array([None if m else float(v) for v, m in zip(vals, nulls)], pa.float64()),
        }
    )
    p1, p2 = _quantile_partials(batch.slice(0, n // 2)), _quantile_partials(batch.slice(n // 2))
    merged = pa.concat_tables([p1, p2]).sort_by([("event_type", "ascending")])
    got = _quantile_finalize(merged).to_pandas().sort_values("event_type").reset_index(drop=True)

    con = duckdb.connect()
    con.register("events", batch)
    want = con.sql(
        """
        SELECT event_type,
               quantile_disc(CAST(FLOOR(value * 100) AS BIGINT), 0.5) AS p50_cents,
               quantile_disc(CAST(FLOOR(value * 100) AS BIGINT), 0.95) AS p95_cents,
               COUNT(*) AS n_events
        FROM events GROUP BY event_type ORDER BY event_type
        """
    ).df()
    con.close()
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    for c in ("p50_cents", "p95_cents"):
        a = [None if pd.isna(x) else int(x) for x in got[c]]
        b = [None if pd.isna(x) else int(x) for x in want[c]]
        assert a == b, c


# ---------------------------------------------------------------------------
# conversation fold kernel
# ---------------------------------------------------------------------------

@SETTINGS
@given(seed=st.integers(0, 10_000), n=st.integers(0, 120))
def test_conversation_fold_matches_pandas(seed, n):
    from nifi_processors_ray.pipelines.conversations import SEP, fold_conversations_block

    rng = np.random.default_rng(seed)
    convs = rng.integers(0, 12, n)
    block = pa.table(
        {
            "conv_id": pa.array([f"c{c}" for c in convs]),
            # unique turn order within a conversation via permuted global ids
            "turn_idx": pa.array(rng.permutation(n).astype(np.int32)),
            "role": pa.array(
                [None if rng.random() < 0.1 else f"r{i % 3}" for i in range(n)]
            ),
            "text": pa.array([f"t{i}" for i in range(n)]),
        }
    )
    got = fold_conversations_block(block).to_pandas().set_index("conv_id").sort_index()

    df = block.to_pandas().sort_values(["conv_id", "turn_idx"])
    want = (
        df.groupby("conv_id")
        .agg(
            n_turns=("text", "size"),
            roles=("role", lambda s: SEP.join("" if pd.isna(x) else x for x in s)),
            transcript=("text", lambda s: SEP.join(s)),
        )
        .sort_index()
    )
    if n == 0:
        assert len(got) == 0
        return
    assert got.index.tolist() == want.index.tolist()
    for c in ("n_turns", "roles", "transcript"):
        assert got[c].tolist() == want[c].tolist(), c


# ---------------------------------------------------------------------------
# grouped exact MAD finalize kernel vs DuckDB mad()
# ---------------------------------------------------------------------------

@SETTINGS
@given(seed=st.integers(0, 10_000), n=st.integers(0, 120))
def test_mad_finalize_matches_duckdb_random(seed, n):
    import duckdb

    from nifi_processors_ray.ops.events import _mad_finalize

    rng = np.random.default_rng(seed)
    types = rng.choice(["a", "b", None], size=n)
    cents = np.where(
        rng.random(n) < 0.15, None, rng.integers(-500, 500, n).astype(object)
    )
    import collections

    hist = collections.Counter(zip(types, cents))
    block = pa.table(
        {
            "event_type": pa.array([k[0] for k in hist], pa.string()),
            "value_cents": pa.array(
                [None if k[1] is None else int(k[1]) for k in hist], pa.int64()
            ),
            "n": pa.array(list(hist.values()), pa.int64()),
        }
    )
    got = (
        _mad_finalize(block)
        .to_pandas()
        .sort_values("event_type", na_position="first")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "raw",
        pa.table(
            {
                "event_type": pa.array(list(types), pa.string()),
                "cents": pa.array(
                    [None if c is None else int(c) for c in cents], pa.int64()
                ),
            }
        ),
    )
    want = con.sql(
        """SELECT event_type, mad(cents) AS mad_cents,
                  CAST(COUNT(*) AS BIGINT) AS n_events
           FROM raw GROUP BY event_type
           ORDER BY event_type NULLS FIRST"""
    ).df()
    if len(got) == 0 and len(want) == 0:
        return
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------------------
# snapshot diff kernel vs naive dict reference
# ---------------------------------------------------------------------------

@SETTINGS
@given(seed=st.integers(0, 10_000), n_old=st.integers(0, 60), n_new=st.integers(0, 60))
def test_diff_sides_matches_naive(seed, n_old, n_new):
    from nifi_processors_ray.pipelines.replay import _diff_sides

    rng = np.random.default_rng(seed)

    def state(n):
        keys = set()
        rows = []
        while len(rows) < n:
            k = (f"c{rng.integers(0, 12)}", int(rng.integers(0, 6)))
            if k in keys:
                continue
            keys.add(k)
            rows.append(
                (
                    *k,
                    str(rng.choice(["user", "assistant"])),
                    None if rng.random() < 0.2 else f"t{rng.integers(0, 4)}",
                    None if rng.random() < 0.5 else "code",
                    None if rng.random() < 0.2 else int(rng.integers(0, 100)),
                )
            )
        return rows

    def tbl(rows):
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

    old_rows, new_rows = state(n_old), state(n_new)
    got = _diff_sides(tbl(old_rows), tbl(new_rows)).to_pydict()
    o = {(r[0], r[1]): r[2:] for r in old_rows}
    nw = {(r[0], r[1]): r[2:] for r in new_rows}
    want = []
    for k in sorted(set(o) | set(nw)):
        if k in o and k not in nw:
            want.append((*k, "deleted"))
        elif k in nw and k not in o:
            want.append((*k, "added"))
        elif o[k] != nw[k]:
            want.append((*k, "updated"))
    assert list(zip(got["conv_id"], got["turn_idx"], got["change_kind"])) == want


@SETTINGS
@given(seed=st.integers(0, 10_000), n=st.integers(0, 120))
def test_trimmed_mean_finalize_matches_duckdb_random(seed, n):
    import collections

    import duckdb

    from nifi_processors_ray.ops.events import _trimmed_mean_finalize

    rng = np.random.default_rng(seed)
    types = rng.choice(["a", "b", None], size=n)
    cents = np.where(
        rng.random(n) < 0.15, None, rng.integers(-500, 500, n).astype(object)
    )
    hist = collections.Counter(zip(types, cents))
    block = pa.table(
        {
            "event_type": pa.array([k[0] for k in hist], pa.string()),
            "value_cents": pa.array(
                [None if k[1] is None else int(k[1]) for k in hist], pa.int64()
            ),
            "n": pa.array(list(hist.values()), pa.int64()),
        }
    )
    got = (
        _trimmed_mean_finalize(block)
        .to_pandas()
        .sort_values("event_type", na_position="first")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "raw",
        pa.table(
            {
                "event_type": pa.array(list(types), pa.string()),
                "cents": pa.array(
                    [None if c is None else int(c) for c in cents], pa.int64()
                ),
            }
        ),
    )
    want = con.sql(
        """WITH b AS (
             SELECT event_type, cents,
                    quantile_disc(cents, 0.05) OVER (PARTITION BY event_type) lo,
                    quantile_disc(cents, 0.95) OVER (PARTITION BY event_type) hi
             FROM raw)
           SELECT event_type,
                  avg(cents) FILTER (cents BETWEEN lo AND hi) AS trimmed_mean_cents,
                  CAST(COUNT(*) AS BIGINT) AS n_events
           FROM b GROUP BY event_type ORDER BY event_type NULLS FIRST"""
    ).df()
    if len(got) == 0 and len(want) == 0:
        return
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
