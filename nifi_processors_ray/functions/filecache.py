"""Shared cache-key recipe for /tmp-derived artifacts.

Several components derive cached artifacts from a source parquet file
(the changelog derivation, the JSONL/CSV exports, the IVF index).  They
all share ONE invalidation contract: the cache key is the source file's
``(abspath, mtime_ns, size)`` plus the derivation parameters, so a
regenerated source (or changed parameters) lands in a fresh directory
instead of silently serving stale data.  Keeping the recipe here means
a future contract change (e.g. adding a content hash) lands everywhere
at once.
"""

from __future__ import annotations

import hashlib
import os


def source_tag(src_path: str, *params) -> str:
    """12-hex cache tag for an artifact derived from ``src_path``."""
    st = os.stat(src_path)
    key = ":".join(
        [os.path.abspath(src_path), str(st.st_mtime_ns), str(st.st_size)]
        + [str(p) for p in params]
    )
    return hashlib.sha1(key.encode()).hexdigest()[:12]
