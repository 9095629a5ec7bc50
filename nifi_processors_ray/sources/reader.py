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


def read_jsonl(paths, *, columns: list[str] | None = None, schema=None, **kwargs) -> ray.data.Dataset:
    """JSON-lines source for the analysis-ops surface (documents and
    friends arriving as ``.jsonl`` exports rather than parquet).

    Same contract as :func:`read_parquet`: optional column projection
    (applied as a fused ``select_columns`` — JSON has no footer to push
    the projection into) and metadata-free block schemas.  Pass
    ``schema`` (a ``pyarrow.Schema``) to pin types when the JSON values
    are ambiguous (e.g. ints that must stay int64 across empty files).
    """
    read_kwargs = dict(kwargs)
    if schema is not None:
        import pyarrow.json as pa_json

        read_kwargs["parse_options"] = pa_json.ParseOptions(
            explicit_schema=schema, unexpected_field_behavior="infer"
        )
    ds = ray.data.read_json(paths, **read_kwargs)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow")


def read_csv(paths, *, columns: list[str] | None = None, schema=None, **kwargs) -> ray.data.Dataset:
    """CSV source with the same contract as :func:`read_jsonl` (column
    projection + optional explicit column types + metadata-free block
    schemas) — the last of the three tabular ingest formats (parquet /
    jsonl / csv) the analysis operators accept interchangeably."""
    read_kwargs = dict(kwargs)
    if schema is not None:
        import pyarrow.csv as pa_csv

        read_kwargs["convert_options"] = pa_csv.ConvertOptions(
            column_types={f.name: f.type for f in schema}
        )
    ds = ray.data.read_csv(paths, **read_kwargs)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow")
