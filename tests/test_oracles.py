"""Driver-contract tests: every oracled query must match its DuckDB
oracle on the shared testdata (row count, column names, values) at
BOTH test scale factors — sf0.01 is the exact comparison the external
driver performs; sf0.001 guards against content-specific luck."""

import duckdb
import pandas as pd
import pytest

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
SF_DIR = SF_DIRS[0]
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    cons = {}
    for sf in SF_DIRS:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        cons[sf] = con
    return cons


@pytest.fixture(scope="module")
def contract():
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _as_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


ORACLED = None


def _oracle_names():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(name, sf_dir, ddb, contract):
    queries, oracles = contract
    assert name in queries, f"oracle {name} has no query"
    ray_df = _normalize(_as_pandas(queries[name](sf_dir)))
    sql_df = _normalize(ddb[sf_dir].sql(oracles[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)} rows"
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, rtol=0, atol=0)


@pytest.mark.usefixtures("ray_session")
def test_rows_only_queries_run(contract):
    queries, oracles = contract
    for name, fn in queries.items():
        if name in oracles:
            continue
        res = _as_pandas(fn(SF_DIR))
        assert res is not None and len(res) >= 0, name


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    import __ray_entry__ as e

    ds = e.entry()
    df = _as_pandas(ds)
    assert len(df) > 0
    assert {"doc_id", "template", "n_spans", "spans"} <= set(df.columns)
