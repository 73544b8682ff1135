"""Side-by-side harness: every queries() entry vs its DuckDB oracle.

Reproduces the driver's comparison locally (row count + schema-sorted,
order-insensitive value compare) at sf0.001 so oracle drift is caught before
the round gate runs at sf0.01.
"""

import math

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings".split()
)


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _to_pandas(obj):
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype == object:
            df[col] = df[col].astype(str)
        elif pd.api.types.is_float_dtype(df[col]):
            df[col] = df[col].round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_all_queries_match_oracles():
    from vigil_ray.queries import oracle_sql, queries

    qs, oracles = queries(), oracle_sql()
    con = _duck(SF)
    failures = []
    for name, fn in qs.items():
        if name not in oracles:
            continue
        ours = _canon(_to_pandas(fn(SF)))
        theirs = _canon(con.execute(oracles[name]).df())
        if len(ours) != len(theirs):
            failures.append(f"{name}: rows {len(ours)} != {len(theirs)}")
            continue
        if list(ours.columns) != list(theirs.columns):
            failures.append(
                f"{name}: columns {list(ours.columns)} != {list(theirs.columns)}"
            )
            continue
        try:
            pd.testing.assert_frame_equal(
                ours, theirs, check_dtype=False, check_exact=False, rtol=1e-6
            )
        except AssertionError as exc:
            failures.append(f"{name}: {str(exc)[:400]}")
    assert not failures, "\n".join(failures)


def test_every_query_has_oracle_or_is_flagged():
    from vigil_ray.queries import oracle_sql, queries

    missing = set(queries()) - set(oracle_sql())
    # every query now has an oracle (the approximate IVF ops assert their
    # recall bound in-query as a 1-row table); keep this set explicit so
    # additions are deliberate
    allowed_oracle_free: set = set()
    assert missing <= allowed_oracle_free, f"queries without oracle SQL: {missing}"
