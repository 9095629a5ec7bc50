"""Dedup family one scale up: 5k vs 50k documents (round-4 task #9).

Pins the signature-shuffle scaling posture with a measurement instead
of an argument: minhash_dup_pairs (band explode) and jaccard_dup_pairs
(candidates → distributed exact verify) run over the sf0.1 corpus and a
10× replica corpus (texts made distinct per replica so the duplicate
STRUCTURE stays the planted one — 10× docs, 10× planted pairs, no
degenerate identical-text clusters).  Expected: ~linear wall growth
(the exchange is signatures/candidates only, both ∝ docs).

Run:  python BENCH/dedup_scale.py   (owns its Ray session; ~3 min)
Writes BENCH/DEDUP_SCALE.json and prints one JSON line per cell.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10
TRIALS = 3


def _build_10x(src_dir: str) -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = os.path.join(src_dir, "documents.parquet")
    out_dir = os.path.join(
        tempfile.gettempdir(), f"npr_dedup_scale_{REPLICAS}x_{os.path.getmtime(src):.0f}"
    )
    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    tbl = pq.read_table(src, columns=["doc_id", "text"])
    parts = []
    for r in range(REPLICAS):
        # distinct ids AND distinct texts per replica: the planted
        # near-dup structure replicates, identical-text clusters don't
        parts.append(
            pa.table(
                {
                    "doc_id": pc.add(tbl.column("doc_id"), r * 1_000_000),
                    "text": pc.binary_join_element_wise(
                        pc.cast(tbl.column("text"), pa.string()), f" rep{r}", " "
                    ),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), out)
    with open(os.path.join(out_dir, "_DONE"), "w") as f:
        f.write("ok")
    return out_dir


def _time(fn, trials: int = TRIALS) -> float:
    walls = []
    for _ in range(trials):
        t0 = time.perf_counter()
        n = fn().count()
        walls.append(time.perf_counter() - t0)
    return (min(walls[1:]) if len(walls) > 1 else walls[0]), n, [round(w, 2) for w in walls]


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from nifi_processors_ray.ops import dedup as D

    big_dir = _build_10x(SF_DIR)
    results = {}
    for label, d in (("1x", SF_DIR), ("10x", big_dir)):
        for op in ("minhash_dup_pairs", "jaccard_dup_pairs"):
            fn = getattr(D, op)
            wall, n_pairs, walls = _time(lambda: fn(D.augmented_documents(d)))
            row = {
                "corpus": label,
                "op": op,
                "steady_sec": round(wall, 2),
                "pairs": int(n_pairs),
                "trials": walls,
            }
            results[f"{op}_{label}"] = row
            print(json.dumps(row), flush=True)
    for op in ("minhash_dup_pairs", "jaccard_dup_pairs"):
        r = results[f"{op}_10x"]["steady_sec"] / max(results[f"{op}_1x"]["steady_sec"], 1e-9)
        results[f"{op}_blowup"] = round(r, 2)
        print(json.dumps({"op": op, "wall_blowup_at_10x_docs": round(r, 2)}), flush=True)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "DEDUP_SCALE.json"), "w"
    ) as f:
        json.dump(results, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
