"""Round-5 final additions: grouped VAR_SAMP/STDDEV_SAMP over exact
integer moments (``order_price_spread``) and the per-source
order-independent XOR integrity checksum (``source_checksum``)."""

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"

ALL_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents",
)


def _sorted_df(res) -> pd.DataFrame:
    df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _oracle_df(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return _sorted_df(con.sql(sql).df())


def test_order_price_spread_oracle(ray_session):
    """Grouped VAR_SAMP/STDDEV_SAMP over exact integer moments:
    bit-exact vs the HUGEINT SQL restatement (check_exact)."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["order_price_spread"])
    got = _sorted_df(q.order_price_spread(SF_DIR))
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_exact=True
    )


def test_order_price_spread_single_row_group_is_null(ray_session, tmp_path):
    """A one-row group has no sample variance: NULL var/std (the n>1
    guard), never a ZeroDivisionError; a varying group matches the
    closed form computed independently."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    t = pa.table(
        {
            "o_orderpriority": pa.array(["A", "B", "B", "B"], pa.string()),
            "o_totalprice": pa.array([10.0, 10.0, 20.0, 36.0], pa.float64()),
        }
    )
    pq.write_table(t, d / "orders.parquet")
    got = _sorted_df(q.order_price_spread(str(d)))
    by_p = got.set_index("o_orderpriority")
    assert pd.isna(by_p.loc["A", "var_price"])
    assert pd.isna(by_p.loc["A", "std_price"])
    n, sx, sxx = 3, 10 + 20 + 36, 100 + 400 + 1296
    want_v = float(n * sxx - sx * sx) / float(n * (n - 1))
    assert by_p.loc["B", "var_price"] == want_v
    assert by_p.loc["B", "std_price"] == math.sqrt(want_v)


def test_source_checksum_oracle(ray_session):
    """Per-source XOR of rolling fingerprints: bit-exact vs the
    recursive-CTE SQL restatement (XOR itself needs no restating —
    int64-exact on both sides)."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["source_checksum"])
    got = _sorted_df(q.source_checksum(SF_DIR))
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_exact=True
    )
    assert got["source"].is_unique


def test_source_checksum_even_multiplicity_cancels(ray_session, tmp_path):
    """XOR self-inverse property, end to end: a source whose every text
    appears an even number of times checksums to exactly 0, regardless
    of row order or batching — the loud invariant an ingest uses to
    certify two copies of a slice agree."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    texts = ["alpha", "beta", "gamma"]
    t = pa.table(
        {
            "source": pa.array(
                ["even"] * 6 + ["odd"] * 3, pa.string()
            ),
            "text": pa.array(
                texts + texts[::-1] + texts, pa.string()
            ),
        }
    )
    pq.write_table(t, d / "documents.parquet")
    got = _sorted_df(q.source_checksum(str(d))).set_index("source")
    assert got.loc["even", "checksum64"] == 0
    assert got.loc["even", "n_docs"] == 6
    # the odd copy's checksum is the XOR of the three fingerprints
    from well_duplicates_ray.functions.textstats import rolling_fingerprint
    import numpy as np

    fp = rolling_fingerprint(pd.Series(texts)).to_numpy()
    assert got.loc["odd", "checksum64"] == int(np.bitwise_xor.reduce(fp))
