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


def test_funnel_view_to_purchase_oracle(ray_session):
    """Two-step funnel conversion: bit-exact int64 microsecond output vs
    the SQL restatement, one row per converted user."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["funnel_view_to_purchase"])
    got = _sorted_df(q.funnel_view_to_purchase(SF_DIR))
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_exact=True
    )
    assert got["user_id"].is_unique
    assert (got["conv_gap_us"] > 0).all()


def test_funnel_sequence_edge_cases(ray_session, tmp_path):
    """Synthesized streams: purchase BEFORE any view does not convert,
    purchase at exactly the first-view timestamp does not convert
    (strict >), views-only and purchases-only users do not convert, and
    the first qualifying purchase (not a later one) is reported."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    us = 1_000_000  # one second in microseconds

    def ts(sec):
        return sec * us

    rows = [
        # user 1: view@1, purchase@5, purchase@3 -> converts at 3
        (1, ts(1), "view"), (1, ts(5), "purchase"), (1, ts(3), "purchase"),
        # user 2: purchase@1, view@2 -> purchase precedes view, no conv
        (2, ts(1), "purchase"), (2, ts(2), "view"),
        # user 3: view@4, purchase@4 (same instant) -> strict >, no conv
        (3, ts(4), "view"), (3, ts(4), "purchase"),
        # user 4: views only
        (4, ts(1), "view"), (4, ts(2), "view"),
        # user 5: purchases only
        (5, ts(1), "purchase"),
        # user 6: view@2 then view@1 (first view is 1), purchase@2 -> conv
        (6, ts(2), "view"), (6, ts(1), "view"), (6, ts(2), "purchase"),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, d / "events.parquet")
    got = _sorted_df(q.funnel_view_to_purchase(str(d)))
    assert sorted(got["user_id"].tolist()) == [1, 6]
    by_u = got.set_index("user_id")
    assert by_u.loc[1, "first_view_us"] == ts(1)
    assert by_u.loc[1, "first_purchase_us"] == ts(3)
    assert by_u.loc[1, "conv_gap_us"] == ts(2)
    assert by_u.loc[6, "first_view_us"] == ts(1)
    assert by_u.loc[6, "first_purchase_us"] == ts(2)


def test_retention_cohorts_oracle(ray_session):
    """Cohort triangle: bit-exact vs the SQL restatement; offset 0 must
    exist for every cohort (the signup event itself is activity)."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["retention_cohorts"])
    got = _sorted_df(q.retention_cohorts(SF_DIR))
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_exact=True
    )
    cohorts = set(got["cohort_week"])
    zero_off = set(got.loc[got["week_offset"] == 0, "cohort_week"])
    assert cohorts == zero_off


def test_retention_cohorts_presignup_excluded(ray_session, tmp_path):
    """Synthesized stream: activity in weeks BEFORE a user's signup week
    is excluded; users who never sign up contribute nothing; a user
    active in signup week and two weeks later fills offsets 0 and 2."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    wk = 604_800_000_000  # one week in microseconds

    def ts(week, off_us=0):
        return week * wk + off_us

    rows = [
        # user 1: click in week 4 (pre-signup, excluded), signup week 5,
        # two events week 5 (one distinct-week cell), view week 7
        (1, ts(4), "click"), (1, ts(5), "signup"),
        (1, ts(5, 60), "view"), (1, ts(7), "view"),
        # user 2: never signs up
        (2, ts(5), "click"), (2, ts(6), "click"),
        # user 3: signup week 5, active week 7 too -> offsets 0 and 2
        (3, ts(5, 99), "signup"), (3, ts(7, 5), "purchase"),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, d / "events.parquet")
    got = _sorted_df(q.retention_cohorts(str(d)))
    cells = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in got.itertuples()
    }
    assert cells == {(5, 0): 2, (5, 2): 2}


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
