"""Vectorized Arrow → JSONL encoding (no pandas, no per-row Python).

Encodes a :class:`pyarrow.Table` batch into one JSON object string per
row using Arrow compute kernels only: string escaping is a chain of
``replace_substring`` passes, numeric / timestamp rendering is a cast,
and assembly is one ``binary_join_element_wise``.  Output matches
``json.dumps(row)`` byte-for-byte on ASCII data (separators ``", "`` /
``": "``, timestamps as ``str(datetime)`` incl. the dropped ``.000000``
fraction); non-ASCII text is emitted as raw UTF-8 (valid JSON; CPython's
``ensure_ascii`` \\uXXXX escapes are the one intentional divergence).

Used by the CLI ``changes`` feed and the format-surface fixture
exporter — both previously paid a Python dict per row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# escape order matters: backslash FIRST (later passes introduce none)
_ESCAPES = [
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
    ("\b", "\\b"),
    ("\f", "\\f"),
]

# the remaining 27 control characters get json.dumps' \u00XX escapes;
# they are applied only when a cheap regex probe finds one in the column
_CTRL_ESCAPES = [
    (chr(c), f"\\u{c:04x}")
    for c in range(0x20)
    if chr(c) not in {"\n", "\r", "\t", "\b", "\f"}
]


def _json_string_values(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """UTF-8 column → JSON string literals (quoted, escaped); null → null."""
    s = col
    for old, new in _ESCAPES:
        s = pc.replace_substring(s, pattern=old, replacement=new)
    # rare path: other control chars (0x00-0x1F) must be \u-escaped or
    # the line is invalid JSON; one regex scan gates the 27 fixed passes
    if pc.any(pc.match_substring_regex(s, r"[\x00-\x1f]")).as_py():
        for old, new in _CTRL_ESCAPES:
            s = pc.replace_substring(s, pattern=old, replacement=new)
    return pc.binary_join_element_wise('"', s, '"', "")


def _json_timestamp_values(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """timestamp[us] → JSON strings matching ``str(datetime)`` exactly:
    the ``.%f`` fraction is omitted when the microsecond part is zero."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if col.type.tz is not None:
        # str(aware datetime) carries a "+HH:MM" suffix the fixed-width
        # slice below would corrupt — fail loud rather than emit garbage
        raise TypeError(f"encode_jsonl: tz-aware timestamps unsupported ({col.type})")
    if col.type.unit != "us":
        # the %S fraction below is precision-wide: normalize to us first.
        # Arrow's default safe cast raises on lossy ns→us, as it must.
        col = pc.cast(col, pa.timestamp("us"))
    # Arrow's %S already includes the (precision-wide) fraction, so this
    # is "....SS.ffffff"; str(datetime) drops the fraction when it is 0
    frac = pc.strftime(col, format="%Y-%m-%d %H:%M:%S")
    plain = pc.utf8_slice_codeunits(frac, 0, stop=-7)
    us = pc.add(
        pc.multiply(pc.millisecond(col).cast(pa.int64()), 1000),
        pc.microsecond(col).cast(pa.int64()),
    )
    body = pc.if_else(pc.equal(us, 0), plain, frac)
    return pc.binary_join_element_wise('"', body, '"', "")


def _json_values(col: pa.ChunkedArray, typ: pa.DataType) -> pa.ChunkedArray:
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        v = _json_string_values(col)
    elif pa.types.is_integer(typ):
        v = pc.cast(col, pa.string())
    elif pa.types.is_boolean(typ):
        v = pc.if_else(col, "true", "false")
    elif pa.types.is_timestamp(typ):
        v = _json_timestamp_values(col)
    else:
        raise TypeError(f"encode_jsonl: unsupported column type {typ}")
    # JSON null — must be filled BEFORE assembly: a null operand would
    # propagate through binary_join_element_wise and null the whole line
    return pc.fill_null(v, "null")


def encode_jsonl(tbl: pa.Table) -> pa.Array:
    """One compact JSON object string per row (schema column order)."""
    if tbl.num_rows == 0:
        return pa.array([], pa.string())
    pieces: list = []
    for i, field in enumerate(tbl.schema):
        key = field.name.replace("\\", "\\\\").replace('"', '\\"')
        prefix = ("{" if i == 0 else ", ") + f'"{key}": '
        pieces.append(prefix)
        pieces.append(_json_values(tbl.column(i), field.type))
    pieces.append("}")
    pieces.append("")  # separator operand
    out = pc.binary_join_element_wise(*pieces)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
