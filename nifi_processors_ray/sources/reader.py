"""Metadata-clean parquet reader.

The driver's testdata parquet files (and any pandas-written parquet)
carry a ``b'pandas'`` schema-metadata blob whose decoded form is
unhashable; Ray Data's block-schema deduplication then logs
``Failed to hash the schemas (for deduplication): unhashable type:
'dict'`` once per read task and block — hundreds of lines per bench
run — and loses the dedup benefit.

Fix at the source: read the footer schema once on the driver, strip the
metadata, project it to the requested columns, and hand Ray the CLEAN
schema — every block then carries hashable schemas from the first
operator on.  Falls back to a per-batch metadata strip (zero-copy
schema swap) for inputs where the footer can't be pre-read (directories,
multi-file globs).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _strip_schema_metadata(batch: pa.Table) -> pa.Table:
    return batch.replace_schema_metadata(None) if batch.schema.metadata else batch


def _clean_schema(path: str, columns: list[str] | None) -> pa.Schema | None:
    try:
        sch = pq.read_schema(path).remove_metadata()
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        return sch
    except Exception:
        return None


def read_parquet(paths, *, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """``ray.data.read_parquet`` that yields metadata-free block schemas."""
    schema = None
    if isinstance(paths, str) and os.path.isfile(paths):
        schema = _clean_schema(paths, columns)
    if schema is not None:
        return ray.data.read_parquet(paths, columns=columns, schema=schema, **kwargs)
    ds = ray.data.read_parquet(paths, columns=columns, **kwargs)
    return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow")
