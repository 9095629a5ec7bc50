"""Driver-style oracle parity for EVERY ``oracle_sql()`` twin, with strict
dtype equality.

Round-1 lesson (VERDICT r1 "What's wrong" #1): the driver's value-hash is
dtype-sensitive even when schema_match passes — DuckDB ``SUM(BIGINT)``
returns HUGEINT, which pandas renders float64, silently hash-mismatching
an engine int64 column with IDENTICAL values.  This test re-implements the
driver compare (sort columns by name, sort rows, compare values) and adds
the strict per-column dtype assert so that class of drift can never ship.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _oracle_con() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _to_frame(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):  # pa.Table | ray.data.Dataset
        return obj.to_pandas()
    raise TypeError(type(obj))


def _driver_normalize(df: pd.DataFrame) -> pd.DataFrame:
    """The driver's compare shape: columns sorted by name, rows sorted by
    all columns, index dropped."""
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _twin_names() -> list[str]:
    import __ray_entry__ as entry

    return sorted(entry.oracle_sql().keys())


@pytest.mark.parametrize("name", _twin_names())
def test_oracle_twin_dtype_and_value_parity(name):
    import __ray_entry__ as entry

    q = entry.queries()[name]
    sql = entry.oracle_sql()[name]

    ours = _driver_normalize(_to_frame(q(SF_DIR)))
    con = _oracle_con()
    try:
        oracle = _driver_normalize(con.sql(sql).df())
    finally:
        con.close()

    assert list(ours.columns) == list(oracle.columns), (
        f"{name}: column names differ: {list(ours.columns)} vs {list(oracle.columns)}"
    )
    assert len(ours) == len(oracle), f"{name}: row counts differ"

    # STRICT dtype parity — the driver's value-hash sees dtypes.
    for c in ours.columns:
        a, b = ours[c].dtype, oracle[c].dtype
        # object-vs-object (strings, lists) is fine; numeric must match exactly
        assert a == b, f"{name}.{c}: engine dtype {a} != oracle dtype {b}"

    for c in ours.columns:
        av, bv = ours[c].to_numpy(), oracle[c].to_numpy()
        if ours[c].dtype == object and len(av) and isinstance(av[0], np.ndarray):
            for x, y in zip(av, bv):
                np.testing.assert_array_equal(x, y, err_msg=f"{name}.{c}")
        elif np.issubdtype(ours[c].dtype, np.floating):
            np.testing.assert_array_equal(av, bv, err_msg=f"{name}.{c} (bit-exact)")
        else:
            assert (pd.Series(av).fillna("\0") == pd.Series(bv).fillna("\0")).all(), (
                f"{name}.{c}: values differ"
            )
