"""Full-registry preflight at the driver's oracle scale (sf0.01).

Re-implements the driver's strict compare (columns sorted by name, rows
sorted by all columns, values compared after dtype normalization) for
EVERY ``oracle_sql()`` twin, and a rows-produced check for the no-SQL
queries — the same gate ``CORRECTNESS_r{N}.json`` applies, but over the
WHOLE registry instead of the driver's 50-query budget.

Run from the repo root (owns its Ray session):

    python BENCH/preflight.py [--sf /root/testdata/sf0.01] [-k substr]

Exit code 0 iff every query passes.  One JSON line per query on stdout;
a summary line at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _to_frame(obj):
    import pandas as pd

    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def _normalize(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("-k", default=None, help="only queries containing this substring")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import duckdb
    import pandas as pd

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_rows_only = n_fail = 0
    for name, fn in queries.items():
        if args.k and args.k not in name:
            continue
        t0 = time.monotonic()
        row: dict = {"query": name}
        try:
            got = _to_frame(fn(args.sf))
            if name in oracles:
                want = con.sql(oracles[name]).df()
                g, o = _normalize(got), _normalize(want)
                same_cols = list(g.columns) == list(o.columns)
                same_rows = len(g) == len(o)
                # driver hash ~ exact value equality after dtype-safe cast
                ok = same_cols and same_rows
                if ok:
                    for c in g.columns:
                        gv, ov = g[c], o[c]
                        if gv.dtype != ov.dtype:
                            try:
                                cast = ov.astype(gv.dtype)
                                # refuse LOSSY casts (e.g. float 2.5 ->
                                # int 2 would mask real value drift as a
                                # pass): the cast must round-trip
                                if not cast.astype(ov.dtype).equals(ov):
                                    ok = False
                                    break
                                ov = cast
                            except (TypeError, ValueError):
                                ok = False
                                break
                        if not gv.equals(ov):
                            ok = False
                            break
                row["status"] = "pass" if ok else "FAIL"
                row["rows"] = len(g)
                if not ok:
                    n_fail += 1
                    row["detail"] = {
                        "cols_match": same_cols,
                        "rows": [len(g), len(o)],
                    }
                else:
                    n_pass += 1
            else:
                row["status"] = "rows_only"
                row["rows"] = int(len(got))
                n_rows_only += 1
        except Exception as ex:  # noqa: BLE001 — preflight must report, not die
            row["status"] = "ERROR"
            row["error"] = f"{type(ex).__name__}: {ex}"[:300]
            n_fail += 1
        row["s"] = round(time.monotonic() - t0, 3)
        print(json.dumps(row), flush=True)
    print(json.dumps({
        "summary": {"pass": n_pass, "rows_only": n_rows_only, "fail": n_fail,
                    "total": n_pass + n_rows_only + n_fail, "sf": args.sf},
    }), flush=True)
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
