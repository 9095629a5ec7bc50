"""Deterministic JSONL / CSV exports of the ``documents`` table.

The analysis operators accept parquet, JSONL and CSV interchangeably
(``sources.reader``); these cached exports are the driver-facing proof:
the SAME operator over a JSONL/CSV round-trip of ``documents.parquet``
must match the parquet-derived SQL oracle bit for bit
(``text_stats_jsonl`` / ``token_counts_csv`` in ``__ray_entry__``).

Exports are cached under /tmp keyed on the source file's (path, mtime,
size) — the same invalidation contract as the changelog and IVF-index
caches — and written as MULTIPLE files so the read parallelizes like a
real multi-file drop zone.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.filecache import source_tag

DOCUMENTS_EXPORT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("text", pa.string()), ("n_chars", pa.int64())]
)

_EXPORT_COLUMNS = [f.name for f in DOCUMENTS_EXPORT_SCHEMA]


def _export_documents(sf_dir: str, fmt: str, files: int = 4) -> list[str]:
    """Export (once, cached) documents as ``files`` JSONL or CSV slices;
    returns the file paths.  The ``_DONE`` marker commits the export —
    a crashed half-write is rewritten from scratch."""
    assert fmt in ("jsonl", "csv")
    src = os.path.join(sf_dir.rstrip("/"), "documents.parquet")
    # "v2": Arrow-native JSONL encoder (raw UTF-8, not \uXXXX) — the tag
    # bump invalidates cached pandas-era exports
    tag = source_tag(src, fmt, files, "v2")
    out = os.path.join(tempfile.gettempdir(), f"npr_docs_{fmt}_{tag}")
    paths = [os.path.join(out, f"part-{i:04d}.{fmt}") for i in range(files)]
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return paths
    os.makedirs(out, exist_ok=True)
    tbl = pq.read_table(src, columns=_EXPORT_COLUMNS)
    n = tbl.num_rows
    per = (n + files - 1) // files
    for i, path in enumerate(paths):
        part = tbl.slice(i * per, per)
        # write-then-atomic-rename: a concurrent builder (pytest + bench
        # on the same corpus) must never truncate a part file a reader
        # that already saw _DONE is streaming; os.replace swaps inodes
        # atomically and the reader keeps its old fd
        tmp = f"{path}.tmp-{os.getpid()}"
        if fmt == "csv":
            import pyarrow.csv as pa_csv

            pa_csv.write_csv(part, tmp)
        else:
            # records-per-line JSON straight from Arrow (escaped \n etc.
            # via the vectorized encoder, so every record stays one
            # physical line — no pandas on any data path)
            from ..functions.jsonl import encode_jsonl

            lines = encode_jsonl(part).to_pylist()
            with open(tmp, "w", encoding="utf-8") as f:
                if lines:
                    f.write("\n".join(lines) + "\n")
        os.replace(tmp, path)
    with open(done, "w") as f:
        f.write(str(n))
    return paths


def documents_jsonl(sf_dir: str) -> list[str]:
    return _export_documents(sf_dir, "jsonl")


def documents_csv(sf_dir: str) -> list[str]:
    return _export_documents(sf_dir, "csv")
