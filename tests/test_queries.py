"""Driver-contract emulation: run each Ray query and its DuckDB oracle on
the same parquet tables; compare row-count + schema + order-insensitive
values, like the driver's CORRECTNESS check."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from well_duplicates_ray.pipelines.queries import (
    EXTRA_QUERIES,
    SQL_ORACLES,
    SQL_QUERIES,
)

ALL_QUERIES = {**SQL_QUERIES, **EXTRA_QUERIES}

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    df = result.to_pandas()  # ray Dataset
    if df.shape[1] == 0:  # empty dataset loses its schema in to_pandas
        schema = result.schema()
        df = pd.DataFrame(
            {
                n: pd.Series(dtype=t.to_pandas_dtype())
                for n, t in zip(schema.names, schema.types)
            }
        )
    return df


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(SQL_ORACLES))
def test_query_matches_oracle(name, ray_session, duck):
    got = _normalize(_to_pandas(ALL_QUERIES[name](SF_DIR)))
    want = _normalize(duck.sql(SQL_ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_exact_pair_group_cap_star_links_mega_group():
    """A duplicate group above EXACT_PAIR_GROUP_CAP must emit the star
    (m-1 hub pairs from the min id), not the O(m^2) triangle — the
    flagship's lossless-connectivity convention applied to the SQL
    surface (VERDICT r2 'wrong' #2)."""
    from well_duplicates_ray.pipelines.queries import (
        EXACT_PAIR_GROUP_CAP,
        _pairs_from_group,
    )

    m = EXACT_PAIR_GROUP_CAP + 500
    ids = np.random.default_rng(7).permutation(np.arange(10, 10 + m))
    out = _pairs_from_group(ids)
    assert out.num_rows == m - 1
    assert out["a"].to_numpy().min() == 10
    assert set(out["a"].to_numpy()) == {10}
    assert sorted(out["b"].to_numpy()) == list(range(11, 10 + m))

    # at-or-below cap: full triangle, a < b everywhere
    small = _pairs_from_group(np.array([5, 3, 9]))
    assert small.num_rows == 3
    assert (small["a"].to_numpy() < small["b"].to_numpy()).all()
