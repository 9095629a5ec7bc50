"""Stable vectorized hashing.

The engine needs a deterministic (cross-process, cross-run) 64-bit hash
of string keys: lake partition placement is ``hash(conv_id)``-based and
must be a pure, stable function of the key so that a resumed or
restarted run (actor restart = the reference's lease failover,
``consumer/AbstractKinesisConsumerProcessor.java:97-104``) finds prior
partition state where it left it.

Python's builtin ``hash`` is salted per process (unusable);
``pyarrow.compute`` has no element-wise hash kernel.  We use polars'
vectorized xxhash (stable for a given polars version, seeded
explicitly); the manifest records an engine fingerprint so a hash-drift
across library upgrades is detected rather than silently misplacing keys.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

HASH_SEED = 0x5EED_CAFE % (2**32)


def hash_strings_u64(values: pa.ChunkedArray | pa.Array | np.ndarray | list) -> np.ndarray:
    """Vectorized stable 64-bit hash of a string column → np.uint64 array.

    Nulls hash to a fixed value (polars hashes nulls deterministically).
    """
    if isinstance(values, (pa.ChunkedArray, pa.Array)):
        s = pl.from_arrow(values)
        if isinstance(s, pl.DataFrame):  # pragma: no cover - defensive
            s = s.to_series()
    else:
        s = pl.Series(values)
    return s.hash(seed=HASH_SEED).to_numpy().astype(np.uint64, copy=False)


def hash_ints_u64(values: pa.ChunkedArray | pa.Array | np.ndarray) -> np.ndarray:
    """Vectorized stable 64-bit mix of an integer column (splitmix64 finalizer).

    Pure numpy — no library dependence, guaranteed stable forever.  Used
    for the salt component (``turn_idx``) of the partitioner.
    """
    if isinstance(values, (pa.ChunkedArray, pa.Array)):
        # fill nulls ARROW-side: letting a nullable int column surface as
        # float64 would both make NaN→uint64 platform-undefined AND round
        # every key ≥ 2^53 (so the same key could hash differently
        # depending on whether its batch happened to contain a null)
        if values.null_count:
            import pyarrow.compute as pc

            values = pc.fill_null(values, 0)
        x = values.to_numpy(zero_copy_only=False)
    else:
        x = values
    if x.dtype.kind == "f":
        # numpy-float caller fallback (e.g. the partitioner's already-
        # converted turn_idx): NaN pins to 0; int32-range values only,
        # so no 2^53 concern on this path
        x = np.nan_to_num(x)
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def engine_hash_fingerprint() -> str:
    """Fingerprint of the hash implementation, recorded in the manifest.

    If a library upgrade changed hash values, resuming against an old
    lake raises instead of silently scattering keys to wrong partitions.
    """
    probe = hash_strings_u64(pa.array(["conv-0", "conv-1", "x", ""]))
    return f"polars-xxh64-seed{HASH_SEED}-{int(probe[0])}-{int(probe[3])}"
