"""Two-phase-commit manifest: the exactly-once core.

The reference checkpoints the stream position BEFORE committing the
downstream session (``consumer/GetKinesisStream.java:283-295``) —
at-least-once with possible skips/duplicates on a crash between the
two.  This engine closes that gap: the per-partition watermarks, the
live data-file list, and the lineage pointer are all recorded in ONE
manifest JSON whose commit is a single atomic ``os.rename``.  Data and
rejected files are written to their final (deterministic) paths first
— phase 1, invisible because no manifest references them — and become
visible only when the manifest lands — phase 2.  A crash at any point
leaves the previous manifest (and therefore the previous consistent
snapshot) intact; orphaned files from a failed epoch are simply
re-written (same deterministic names) when the epoch is retried.

Replay idempotence: the tailer reads only ``seq > min(watermarks)``,
and the merge stage additionally drops rows with
``seq <= watermark[partition]`` — so a duplicated / retried batch
(Ray task retry = the reference's lease-failover redelivery,
``consumer/AbstractKinesisConsumerProcessor.java:97-104``) applies as
a no-op.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field


@dataclass
class Manifest:
    epoch: int
    num_partitions: int
    salt_factor: int
    hash_fingerprint: str
    # per-partition high-water mark of applied change seq
    watermarks: dict[int, int] = field(default_factory=dict)
    # per-partition list of live data files (relative to lake_dir)
    files: dict[int, list[str]] = field(default_factory=dict)
    # per-partition PHYSICAL rows in the live files (for metrics /
    # compaction planning).  Under merge-on-read this counts delta rows
    # incl. superseded versions and tombstones — an upper bound on live
    # keys, exact again after each compaction fold.
    rows: dict[int, int] = field(default_factory=dict)
    lineage_files: list[str] = field(default_factory=list)
    rejected_files: list[str] = field(default_factory=list)
    deadletter_files: list[str] = field(default_factory=list)
    committed_at: float = 0.0

    def watermark(self, part: int) -> int:
        return self.watermarks.get(part, -1)

    @property
    def min_watermark(self) -> int:
        if len(self.watermarks) < self.num_partitions:
            return -1
        return min(self.watermarks.values()) if self.watermarks else -1

    def to_json(self) -> str:
        return json.dumps(
            {
                "format_version": 1,
                "epoch": self.epoch,
                "num_partitions": self.num_partitions,
                "salt_factor": self.salt_factor,
                "hash_fingerprint": self.hash_fingerprint,
                "watermarks": {str(k): v for k, v in self.watermarks.items()},
                "files": {str(k): v for k, v in self.files.items()},
                "rows": {str(k): v for k, v in self.rows.items()},
                "lineage_files": self.lineage_files,
                "rejected_files": self.rejected_files,
                "deadletter_files": self.deadletter_files,
                "committed_at": self.committed_at,
            }
        )

    @staticmethod
    def from_json(s: str) -> "Manifest":
        d = json.loads(s)
        return Manifest(
            epoch=d["epoch"],
            num_partitions=d["num_partitions"],
            salt_factor=d["salt_factor"],
            hash_fingerprint=d["hash_fingerprint"],
            watermarks={int(k): v for k, v in d["watermarks"].items()},
            files={int(k): v for k, v in d["files"].items()},
            rows={int(k): v for k, v in d.get("rows", {}).items()},
            lineage_files=d.get("lineage_files", []),
            rejected_files=d.get("rejected_files", []),
            deadletter_files=d.get("deadletter_files", []),
            committed_at=d.get("committed_at", 0.0),
        )


class ManifestStore:
    """Atomic manifest persistence under ``{lake_dir}/_manifest``.

    Layout: ``manifest-{epoch:010d}.json`` (immutable snapshots) +
    ``CURRENT`` (a one-line pointer file, swapped by atomic rename).
    """

    def __init__(self, manifest_dir: str):
        self.dir = manifest_dir
        os.makedirs(self.dir, exist_ok=True)

    def at_epoch(self, epoch: int) -> Manifest | None:
        """The immutable snapshot committed at ``epoch`` (None if never
        committed).  Snapshots are retained forever (vacuum only deletes
        data/metadata files, never manifests), so any historical epoch
        can be addressed; whether its DATA files still exist depends on
        vacuum — see ``CdcEngine.state_at``."""
        path = os.path.join(self.dir, f"manifest-{epoch:010d}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return Manifest.from_json(f.read())

    def epochs(self) -> list[int]:
        """All committed epochs, ascending."""
        out = []
        for f in os.listdir(self.dir):
            if f.startswith("manifest-") and f.endswith(".json"):
                out.append(int(f[len("manifest-") : -len(".json")]))
        return sorted(out)

    def expire(self, keep_last: int) -> int:
        """Delete manifest snapshots older than the newest ``keep_last``.

        Bounds metadata growth on a long stream (one snapshot per epoch
        forever otherwise) — the Iceberg ``expire_snapshots`` analog.
        The CURRENT pointer's target is always kept regardless.  Expired
        epochs simply stop being time-travelable (``at_epoch`` → None);
        data files are untouched (vacuum owns those).  Returns the
        number of snapshots deleted.
        """
        if keep_last < 1:
            raise ValueError("keep_last must be ≥ 1")
        epochs = self.epochs()
        cur = self.latest()
        keep = set(epochs[-keep_last:])
        if cur is not None:
            keep.add(cur.epoch)
        deleted = 0
        for e in epochs:
            if e in keep:
                continue
            os.remove(os.path.join(self.dir, f"manifest-{e:010d}.json"))
            deleted += 1
        if deleted:
            self._fsync_dir()
        return deleted

    def latest(self) -> Manifest | None:
        cur = os.path.join(self.dir, "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            name = f.read().strip()
        path = os.path.join(self.dir, name)
        if not os.path.exists(path):
            # Power-crash edge: CURRENT's rename persisted but the manifest
            # file's didn't (rename ordering across a crash isn't
            # guaranteed even with the dir fsyncs below, on some
            # filesystems).  Fall back to the newest snapshot that DOES
            # exist — always a previously committed, consistent state.
            snaps = sorted(
                f for f in os.listdir(self.dir)
                if f.startswith("manifest-") and f.endswith(".json")
            )
            if not snaps:
                return None
            path = os.path.join(self.dir, snaps[-1])
        with open(path) as f:
            return Manifest.from_json(f.read())

    def commit(self, manifest: Manifest) -> str:
        """Atomically publish ``manifest`` as the current snapshot."""
        manifest.committed_at = time.time()
        name = f"manifest-{manifest.epoch:010d}.json"
        self._atomic_write(os.path.join(self.dir, name), manifest.to_json())
        self._fsync_dir()  # the snapshot must be durable BEFORE CURRENT names it
        self._atomic_write(os.path.join(self.dir, "CURRENT"), name)
        self._fsync_dir()
        return name

    def writer_lock(self):
        """Exclusive advisory lock for the single-writer contract.

        Two engine processes replaying the same lake would race the same
        epoch's deterministic paths and clobber each other's commits —
        acquiring this (``flock``, non-blocking) around each epoch makes
        the second writer fail fast instead.  Advisory and local-host
        only (flock over NFS is unreliable): cluster deployments must
        still ensure one driver per lake via the job scheduler.
        """
        import contextlib

        try:
            import fcntl
        except ImportError:  # non-POSIX: degrade to unenforced single-writer
            return contextlib.nullcontext()

        @contextlib.contextmanager
        def _lock():
            fd = os.open(os.path.join(self.dir, "LOCK"), os.O_CREAT | os.O_RDWR)
            try:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                except OSError as ex:
                    raise RuntimeError(
                        "another writer holds this lake's manifest lock "
                        f"({self.dir}/LOCK); one writer per lake"
                    ) from ex
                yield
            finally:
                os.close(fd)  # releases the flock

        return _lock()

    def _fsync_dir(self) -> None:
        try:
            fd = os.open(self.dir, os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        except OSError:  # platform without directory fsync
            pass

    def _atomic_write(self, path: str, content: str) -> None:
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)
