"""Replicates the driver's correctness gate: every ``queries()`` entry runs
on Spark and is compared value-for-value (order-insensitive, columns sorted
by name) against its ``oracle_sql()`` DuckDB equivalent."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if str(out[c].dtype).startswith(("int", "uint")) or str(
            out[c].dtype
        ) in ("object",):
            pass
        if "datetime" in str(out[c].dtype):
            out[c] = out[c].astype("datetime64[us]")
    # ints: unify to int64 where possible
    for c in cols:
        try:
            if str(out[c].dtype) not in ("object", "string"):
                if "int" in str(out[c].dtype).lower():
                    out[c] = out[c].astype("int64")
        except TypeError:
            pass
    return out.sort_values(cols).reset_index(drop=True)


QUERY_NAMES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = _normalize(q(spark, sf_dir).toPandas())
    want = _normalize(duck.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        got.columns,
        want.columns,
    )
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert {"url", "dom", "text"} <= set(df.columns)


def test_oracle_keys_cover_queries():
    assert set(entrymod.oracle_sql()) == set(entrymod.queries())
