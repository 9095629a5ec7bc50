"""CLI entry point — the ``ray job submit`` deployment surface.

On a real cluster:

    ray job submit --working-dir . -- python -m nifi_processors_ray replay \
        --lake s3://bucket/lake --log s3://bucket/changelog \
        --partitions 4096 --epoch-events 100000000

Locally the same commands run against filesystem paths.  This is the
only module that may own a Ray session (guarded — the driver contract
initialises Ray itself).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")


def _import_hook(spec: str, flag: str):
    """Resolve a ``module:function`` CLI value to the callable — the
    deployment-surface injection point for the user-extension seam (the
    reference injects a RecordsHandler the same way,
    consumer/RecordsHandler.java:29-52).  The module must be importable
    on the workers (ship it via ``ray job submit --working-dir``)."""
    import importlib

    mod_name, sep, fn_name = spec.partition(":")
    if not sep or not mod_name or not fn_name:
        raise SystemExit(f"{flag} must look like 'package.module:function', got {spec!r}")
    try:
        mod = importlib.import_module(mod_name)
    except ImportError as ex:
        raise SystemExit(f"{flag}: cannot import module {mod_name!r}: {ex}")
    fn = getattr(mod, fn_name, None)
    if fn is None:
        raise SystemExit(f"{flag}: module {mod_name!r} has no attribute {fn_name!r}")
    return fn


def _engine(args):
    from .config import EngineConfig
    from .pipelines.replay import CdcEngine

    enrich = _import_hook(args.enrich, "--enrich") if getattr(args, "enrich", None) else None
    merge_policy = (
        _import_hook(args.merge_policy, "--merge-policy")
        if getattr(args, "merge_policy", None)
        else None
    )
    return CdcEngine(
        EngineConfig(
            lake_dir=args.lake,
            changelog_paths=tuple(args.log),
            num_partitions=args.partitions,
            salt_factor=args.salt_factor,
            epoch_events=args.epoch_events,
            initial_position=args.initial_position,
            merge_mode=args.merge_mode,
            auto_mor_ratio=args.auto_mor_ratio,
            compact_threshold=args.compact_threshold,
            merge_concurrency=args.merge_concurrency,
            enrich=enrich,
            merge_policy=merge_policy,
        )
    )


def cmd_replay(args) -> int:
    _ensure_ray()
    eng = _engine(args)
    if args.follow:
        results = eng.follow(
            poll_ms=args.poll_ms,
            max_polls=args.max_polls,
            max_epochs_per_round=args.max_epochs,
        )
    else:
        results = eng.replay(max_epochs=args.max_epochs)
    out = {
        "epochs": len(results),
        "applied": sum(r.n_applied for r in results),
        "rejected": sum(r.n_rejected for r in results),
        "seq_hi": results[-1].seq_hi if results else None,
    }
    print(json.dumps(out))
    return 0


def cmd_status(args) -> int:
    eng = _engine(args)
    man = eng.store.latest()
    if man is None:
        print(json.dumps({"committed": False}))
        return 0
    from .sources import tailer

    head = tailer.head_seq(eng.log_infos()) if args.log else None
    print(
        json.dumps(
            {
                "committed": True,
                "epoch": man.epoch,
                "min_watermark": man.min_watermark,
                "log_head": head,
                "lag_events": (head - man.min_watermark) if head is not None else None,
                "partitions": man.num_partitions,
                "rows": sum(man.rows.values()),
                "deadletter_files": len(man.deadletter_files),
            }
        )
    )
    return 0


def cmd_metrics(args) -> int:
    """Throughput/lag metrics from the lineage log (north-rule metric).

    Granularity mirrors the reference's CloudWatch metrics-level knob
    NONE/SUMMARY/DETAILED (``consumer/AbstractKinesisConsumerProcessor
    .java:193-224``): ``none`` emits nothing (metrics off), ``summary``
    one stream-wide rollup row, ``detailed`` the per-partition breakdown.
    """
    if args.metrics_level == "none":
        print(json.dumps([]))
        return 0
    _ensure_ray()
    from ray.data.aggregate import Count, Max, Min, Sum

    eng = _engine(args)
    aggs = (
        Sum("n_applied", alias_name="applied"),
        Sum("n_rejected", alias_name="rejected"),
        Sum("wall_ms", alias_name="wall_ms"),
        Min("seq_lo", alias_name="seq_lo"),
        Max("seq_hi", alias_name="seq_hi"),
        Count(alias_name="batches"),
    )
    if args.metrics_level == "summary":
        row = eng.lineage().aggregate(*aggs)
        print(json.dumps([{k: row.get(k) for k in
                           ("applied", "rejected", "wall_ms", "seq_lo", "seq_hi", "batches")}]))
        return 0
    table = (
        eng.lineage().groupby("partition").aggregate(*aggs).sort("partition").to_pandas()
    )
    print(table.to_json(orient="records"))
    return 0


def cmd_vacuum(args) -> int:
    eng = _engine(args)
    print(json.dumps({"deleted": eng.vacuum()}))
    return 0


def cmd_bootstrap(args) -> int:
    """Bulk-load an initial table snapshot, then (optionally) tail."""
    if args.snapshot is None or args.as_of_seq is None:
        print("bootstrap requires --snapshot and --as-of-seq", file=sys.stderr)
        return 2
    _ensure_ray()
    eng = _engine(args)
    res = eng.bootstrap(args.snapshot, args.as_of_seq)
    out = {"epoch": res.epoch, "applied": res.n_applied, "rejected": res.n_rejected}
    if args.then_replay:
        tail = eng.replay(max_epochs=args.max_epochs)
        out["tail_epochs"] = len(tail)
        out["tail_applied"] = sum(r.n_applied for r in tail)
    print(json.dumps(out))
    return 0


def cmd_reprocess(args) -> int:
    """Re-drive the dead-letter quarantine through the merge after an
    operator fixed the fault (the failure-relationship re-queue)."""
    _ensure_ray()
    eng = _engine(args)
    res = eng.reprocess_deadletters()
    if res is None:
        print(json.dumps({"reprocessed": 0, "epoch": None}))
    else:
        print(json.dumps({"reprocessed": res.n_applied, "epoch": res.epoch}))
    return 0


def cmd_expire(args) -> int:
    eng = _engine(args)
    print(json.dumps({"expired": eng.expire_snapshots(args.keep_last)}))
    return 0


def cmd_forget(args) -> int:
    """Targeted erasure (right-to-be-forgotten): tombstone every live
    key of the given conversations through the ordinary merge as one
    epoch.  Pair with `expire` + `vacuum` to make the bytes physically
    unrecoverable."""
    if not args.conv:
        print("forget requires at least one --conv", file=sys.stderr)
        return 2
    _ensure_ray()
    eng = _engine(args)
    res = eng.forget_conversations(args.conv)
    if res is None:
        print(json.dumps({"forgotten": 0}))
    else:
        print(json.dumps({"forgotten": res.n_applied, "epoch": res.epoch}))
    return 0


def cmd_compact(args) -> int:
    """Fold multi-file (MOR delta) partitions back to one COW file set
    per partition without consuming stream events — run before a heavy
    read window to bound read amplification; state is unchanged
    (`state_at(new) == state_at(prior)`).  Also folds per-epoch
    lineage/rejected metadata into one file each when they have
    accumulated — the lineage-metrics read then touches one file
    instead of one per epoch."""
    _ensure_ray()
    eng = _engine(args)
    rec = eng.compact_partitions()
    man = eng.store.latest()
    n_meta = (len(man.lineage_files) + len(man.rejected_files)) if man else 0
    if man and (len(man.lineage_files) > 1 or len(man.rejected_files) > 1):
        man2 = eng.compact_metadata()
        rec["metadata_files_before"] = n_meta
        rec["metadata_files_after"] = len(man2.lineage_files) + len(man2.rejected_files)
    print(json.dumps(rec))
    return 0


def cmd_export(args) -> int:
    """Export the converged lake state as partitioned Parquet through
    the RESUMABLE sink (per-partition _DONE markers: a crashed export
    re-run writes only unfinished partitions) — the hand-off surface to
    downstream training-data readers that should not read lake
    internals."""
    if not args.output:
        print("export requires --output", file=sys.stderr)
        return 2
    import os

    from .sinks import write_partitioned_parquet

    _ensure_ray()
    eng = _engine(args)
    # an export captures ONE committed epoch; the resumable sink's _DONE
    # markers would otherwise make a re-run against an ADVANCED lake
    # silently keep the stale state with a success receipt — pin the
    # epoch BEFORE any partition is written, so even a crash-resume
    # (some _DONE markers present, run incomplete) compares against the
    # epoch the finished partitions came from and fails loud on a moved
    # lake (exports are immutable; new epoch → new dir)
    epoch = eng.store.latest().epoch if eng.store.latest() else 0
    marker = os.path.join(args.output, "_export_epoch.json")
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                prior = json.load(f)["epoch"]
        except (ValueError, KeyError, TypeError):
            # ValueError: truncated/invalid JSON; TypeError: valid JSON
            # that isn't an object ('null', '[1]'); KeyError: no epoch
            # a crash mid-pin left a truncated marker: the pinned epoch
            # is unknowable, so the stale-resume guard cannot run —
            # refuse cleanly rather than traceback or silently resume
            print(
                f"corrupt export marker {marker} (crash during pin?); "
                "exports are immutable — use a new --output",
                file=sys.stderr,
            )
            return 2
        if prior != epoch:
            print(
                f"output dir holds an export of epoch {prior}, lake is at "
                f"{epoch}; exports are immutable — use a new --output",
                file=sys.stderr,
            )
            return 2
    else:
        os.makedirs(args.output, exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"epoch": epoch}, f)
        os.replace(tmp, marker)  # atomic: the pin is whole or absent
    receipt = write_partitioned_parquet(
        eng.final_state(),
        args.output,
        key="conv_id",
        num_partitions=args.export_partitions,
        sort_key=["conv_id", "turn_idx"],
    )
    receipt["epoch"] = epoch
    print(json.dumps(receipt))
    return 0


def cmd_changes(args) -> int:
    """Emit one epoch's net-change feed as JSON lines (the CDC-consumer
    surface: downstreams follow the lake without rereading state)."""
    from .functions.jsonl import encode_jsonl

    _ensure_ray()
    eng = _engine(args)
    feed = eng.epoch_changes(args.epoch)
    # vectorized JSONL per Arrow batch — the feed can be large, so no
    # per-row Python dict; output is byte-identical to json.dumps(row)
    # (incl. JSON null for a delete row's null ts)
    for batch in feed.iter_batches(batch_format="pyarrow"):
        lines = encode_jsonl(batch).to_pylist()
        if lines:
            sys.stdout.write("\n".join(lines) + "\n")
    return 0


def cmd_diff(args) -> int:
    """Emit the snapshot-to-snapshot diff (added/updated/deleted keys
    between two commits) as JSON lines — the reconciliation surface for
    a downstream that wants to audit a derived table against the lake
    without replaying the changefeed."""
    from .functions.jsonl import encode_jsonl

    _ensure_ray()
    eng = _engine(args)
    if args.from_epoch is None:
        raise SystemExit("diff: --from-epoch is required")
    diff = eng.state_diff(args.from_epoch, args.to_epoch)
    for batch in diff.iter_batches(batch_format="pyarrow"):
        lines = encode_jsonl(batch).to_pylist()
        if lines:
            sys.stdout.write("\n".join(lines) + "\n")
    return 0


def cmd_hot_keys(args) -> int:
    """Emit the hot-key churn report (top conversations by valid change
    volume, with op mix) as JSON lines — the skew audit an operator
    runs to decide which keys need salting."""
    from .functions.jsonl import encode_jsonl

    _ensure_ray()
    eng = _engine(args)
    report = eng.hot_keys(top_n=args.top)
    for batch in report.iter_batches(batch_format="pyarrow"):
        lines = encode_jsonl(batch).to_pylist()
        if lines:
            sys.stdout.write("\n".join(lines) + "\n")
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="nifi_processors_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in (
        ("replay", cmd_replay),
        ("status", cmd_status),
        ("metrics", cmd_metrics),
        ("vacuum", cmd_vacuum),
        ("bootstrap", cmd_bootstrap),
        ("reprocess", cmd_reprocess),
        ("expire", cmd_expire),
        ("compact", cmd_compact),
        ("export", cmd_export),
        ("changes", cmd_changes),
        ("diff", cmd_diff),
        ("hot-keys", cmd_hot_keys),
        ("forget", cmd_forget),
    ):
        p = sub.add_parser(name)
        p.add_argument("--lake", required=True)
        p.add_argument("--log", action="append", default=[])
        p.add_argument("--partitions", type=int, default=32)
        p.add_argument("--salt-factor", type=int, default=4)
        p.add_argument("--epoch-events", type=int, default=2_000_000)
        p.add_argument("--initial-position", default="TRIM_HORIZON")
        p.add_argument("--merge-mode", default="auto", choices=["cow", "mor", "auto"])
        p.add_argument("--auto-mor-ratio", type=float, default=0.2)
        p.add_argument("--compact-threshold", type=int, default=8)
        p.add_argument("--merge-concurrency", type=int, default=None)
        p.add_argument("--max-epochs", type=int, default=None)
        p.add_argument("--follow", action="store_true", help="continuous tail mode")
        p.add_argument("--poll-ms", type=int, default=1000)
        p.add_argument("--max-polls", type=int, default=None)
        p.add_argument(
            "--metrics-level",
            default="detailed",
            choices=["none", "summary", "detailed"],
            help="metrics granularity (the reference's NONE/SUMMARY/DETAILED knob)",
        )
        p.add_argument("--snapshot", default=None, help="bootstrap: snapshot parquet path")
        p.add_argument("--as-of-seq", type=int, default=None, help="bootstrap: snapshot seq")
        p.add_argument(
            "--then-replay", action="store_true", help="bootstrap: tail the log afterwards"
        )
        p.add_argument("--keep-last", type=int, default=10, help="expire: snapshots to keep")
        p.add_argument("--epoch", type=int, default=None, help="changes: epoch (default latest)")
        p.add_argument("--top", type=int, default=20, help="hot-keys: report size")
        p.add_argument("--from-epoch", type=int, default=None, help="diff: old commit epoch")
        p.add_argument("--to-epoch", type=int, default=None, help="diff: new commit epoch (default head)")
        p.add_argument(
            "--conv", action="append", default=[], help="forget: conversation id (repeatable)"
        )
        p.add_argument(
            "--enrich", default=None, metavar="MODULE:FN",
            help="user-extension seam: per-batch enrich callable "
                 "(pa.Table -> pa.Table), imported as module:function",
        )
        p.add_argument(
            "--merge-policy", default=None, metavar="MODULE:FN",
            help="user-extension seam: custom per-key merge callable, "
                 "imported as module:function",
        )
        p.add_argument("--output", default=None, help="export: output directory")
        p.add_argument(
            "--export-partitions", type=int, default=64,
            help="export: partition count of the output layout",
        )
        p.set_defaults(fn=fn)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
