"""HyperLogLog sketch accuracy + merge semantics."""

import numpy as np
import pyarrow as pa
import ray.data

from nifi_processors_ray.functions import sketches as S

SF_DIR = "/root/testdata/sf0.001"


def test_small_range_is_near_exact():
    ds = ray.data.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id"])
    exact = len(set(r["user_id"] for r in ds.take_all()))
    est = S.approx_distinct(ds, "user_id")
    assert est == exact  # linear-counting regime: 15 distinct of 4096 regs


def test_high_cardinality_within_error_bound():
    n = 200_000
    vals = pa.table({"k": pa.array(np.arange(n, dtype=np.int64))})
    ds = ray.data.from_arrow(vals)
    est = S.approx_distinct(ds, "k")
    assert abs(est - n) / n < 0.05  # 3σ of the 1.6% standard error


def test_merge_equals_single_pass():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 50_000, 100_000)
    b = rng.integers(25_000, 75_000, 100_000)
    pa_a, pa_b = pa.array(a), pa.array(b)
    merged = S.hll_merge([S.hll_partial(pa_a), S.hll_partial(pa_b)])
    single = S.hll_partial(pa.array(np.concatenate([a, b])))
    assert (merged == single).all()
    exact = len(set(a) | set(b))
    assert abs(S.hll_estimate(merged) - exact) / exact < 0.05


def test_string_column_support():
    ds = ray.data.from_arrow(
        pa.table({"s": pa.array([f"doc-{i % 1000}" for i in range(10_000)])})
    )
    est = S.approx_distinct(ds, "s")
    assert abs(est - 1000) / 1000 < 0.05


def test_qsketch_merge_equals_single_pass():
    rng = np.random.default_rng(7)
    v = rng.normal(100, 25, 50_000)
    keys = S.hash_ints_u64(pa.array(np.arange(50_000, dtype=np.int64)))
    halves = [
        S.qsketch_partial(v[:25_000], keys[:25_000]),
        S.qsketch_partial(v[25_000:], keys[25_000:]),
    ]
    mh, mv = S.qsketch_merge(halves)
    sh, sv = S.qsketch_partial(v, keys)
    assert (mh == sh).all() and (mv == sv).all()


def test_qsketch_rank_error_within_bound(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.01/events.parquet"
    ds = ray.data.read_parquet(sf, columns=["event_id", "value"])
    p50, p95 = S.approx_quantiles(ds, "value", "event_id", qs=(0.5, 0.95))
    con = duckdb.connect()
    vals = con.sql(f"SELECT value FROM read_parquet('{sf}')").fetchnumpy()["value"]
    # rank of the estimate must sit within ~4σ of the target rank
    # (σ = sqrt(q(1-q)/k), k=4096 → σ(0.5)=0.0078)
    for q, est in [(0.5, p50), (0.95, p95)]:
        rank = (vals <= est).mean()
        assert abs(rank - q) < 4 * np.sqrt(q * (1 - q) / S.DEFAULT_QK), (q, est, rank)


def test_qsketch_exact_when_population_fits():
    v = np.array([5.0, 1.0, 3.0, 2.0, 4.0])
    keys = S.hash_ints_u64(pa.array(np.arange(5, dtype=np.int64)))
    _, sample = S.qsketch_partial(v, keys)
    assert S.qsketch_quantiles(sample, (0.5,)) == [3.0]  # k > n: sample IS the data


def test_mg_guarantee_on_events(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.01/events.parquet"
    ds = ray.data.read_parquet(sf, columns=["user_id"])
    keys, est = S.heavy_hitters(ds, "user_id", k=64)
    con = duckdb.connect()
    exact = dict(
        con.sql(
            f"SELECT user_id, COUNT(*) FROM read_parquet('{sf}') GROUP BY 1"
        ).fetchall()
    )
    n = sum(exact.values())
    bound = n / 65  # n/(k+1)
    est_by_key = dict(zip(keys.tolist(), est.tolist()))
    for u, c in exact.items():
        if c > bound:  # every true heavy hitter must survive
            assert u in est_by_key, (u, c, bound)
    for u, e in est_by_key.items():  # estimates only ever undercount, within bound
        assert exact[u] - bound <= e <= exact[u], (u, e, exact[u])


def test_mg_merge_matches_whole_stream_bound():
    rng = np.random.default_rng(11)
    # zipf-ish stream: key 0 is ~half the mass
    stream = np.concatenate([np.zeros(5000, np.int64), rng.integers(1, 500, 5000)])
    halves = [
        S.mg_partial(pa.array(stream[:5000]), k=16),
        S.mg_partial(pa.array(stream[5000:]), k=16),
    ]
    keys, est = S.mg_merge(halves, k=16)
    d = dict(zip(keys.tolist(), est.tolist()))
    true0 = int((stream == 0).sum())
    assert 0 in d and true0 - len(stream) / 17 <= d[0] <= true0


def test_grouped_hll_error_bound(ray_session):
    """Per-group HLL estimate within 5% of the exact per-type distinct
    user count (p=12 → σ ≈ 1.6%; 4σ headroom)."""
    import duckdb

    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    df = entry.queries()["events_approx_users_by_type"](sf).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    exact = dict(
        con.sql(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    con.close()
    assert len(df) == len(exact)
    for _, row in df.iterrows():
        e = exact[row["event_type"]]
        assert abs(row["approx"] - e) <= max(0.05 * e, 2), (row["event_type"], row["approx"], e)
