"""Round-5 late additions: the Q5-shape six-table snowflake join
(``local_supplier_volume``, both size-gate paths), grouped MODE with
deterministic tie-break (``top_lang_per_source``), and the overlapping
interval RANGE join (``acctbal_band_counts``)."""

import duckdb
import pandas as pd
import pytest

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


def test_local_supplier_volume_oracle_and_paths(ray_session, monkeypatch):
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["local_supplier_volume"])
    assert len(want) > 0  # the window/region filter must not be vacuous
    got = _sorted_df(q.local_supplier_volume(SF_DIR))
    pd.testing.assert_frame_equal(got, want)

    # force the above-gate shuffle-join branch; must be bit-identical
    monkeypatch.setattr(q, "LOCAL_VOLUME_JOIN_GATE", 0)
    shuffled = _sorted_df(q.local_supplier_volume(SF_DIR))
    pd.testing.assert_frame_equal(shuffled, want)


def test_top_lang_per_source_oracle(ray_session):
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["top_lang_per_source"])
    got = _sorted_df(q.top_lang_per_source(SF_DIR))
    pd.testing.assert_frame_equal(got, want)
    # one row per source, and ties (if any) resolved to the smallest lang
    assert got["source"].is_unique


def test_top_lang_tiebreak_is_lexicographic(ray_session):
    """Synthesized tied counts: mode must pick the lexicographically
    smallest lang, matching the oracle's ORDER BY cnt DESC, lang."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from well_duplicates_ray.pipelines import queries as q

    tmp = "/tmp/wdr_test_mode_tie"
    import os
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    t = pa.table(
        {
            "doc_id": [f"d{i}" for i in range(6)],
            "text": ["x"] * 6,
            "lang": ["zz", "aa", "zz", "aa", "mm", "aa"],
            "source": ["s1", "s1", "s1", "s1", "s1", "s2"],
            "n_chars": [1] * 6,
        }
    )
    pq.write_table(t, f"{tmp}/documents.parquet")
    got = _sorted_df(q.top_lang_per_source(tmp))
    assert got.loc[got["source"] == "s1", "top_lang"].item() == "aa"
    assert got.loc[got["source"] == "s1", "cnt"].item() == 2
    shutil.rmtree(tmp, ignore_errors=True)


def test_neardup_simhash_pairs_oracle(ray_session):
    """Banded pipeline == brute-force all-pairs cross join: pigeonhole
    makes the LSH exact (radius < band count), so every pair and every
    hamming distance must match bit-for-bit."""
    from well_duplicates_ray.pipelines import queries as q

    assert q.SIMHASH_PAIR_BANDS > q.SIMHASH_PAIR_RADIUS  # exactness bound
    assert 64 % q.SIMHASH_PAIR_BANDS == 0
    want = _oracle_df(q.SQL_ORACLES["neardup_documents_simhash"])
    assert len(want) > 0
    got = _sorted_df(q.neardup_documents_simhash(SF_DIR))
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict())
    )
    assert (got["hamming"] <= q.SIMHASH_PAIR_RADIUS).all()


def test_acctbal_band_counts_oracle(ray_session):
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["acctbal_band_counts"])
    got = _sorted_df(q.acctbal_band_counts(SF_DIR))
    pd.testing.assert_frame_equal(got, want)


def test_global_price_rank_oracle(ray_session):
    """Distributed sample-sort rank == ROW_NUMBER/NTILE over the total
    order — exact, not approximate: boundaries only partition; ranks come
    from counted offsets plus local sorts."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["global_price_rank"])
    got = _sorted_df(q.global_price_rank(SF_DIR))
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_global_price_rank_partition_invariant(ray_session, monkeypatch):
    """Many more (and therefore skinnier) range partitions must not
    change a single rank — proves offsets/boundaries compose exactly."""
    from well_duplicates_ray.pipelines import queries as q

    base = _sorted_df(q.global_price_rank(SF_DIR))
    monkeypatch.setattr(q, "WINDOW_PARTITION_TARGET_ROWS", 64)
    many = _sorted_df(q.global_price_rank(SF_DIR))
    pd.testing.assert_frame_equal(base, many)


def _rank_tmp_dir(prices, keys):
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = "/tmp/wdr_test_rank"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "o_custkey": pa.array([1] * len(keys), pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(keys)),
                "o_totalprice": pa.array(prices, pa.float64()),
                "o_orderdate": pa.array(
                    [pd.Timestamp("1995-01-01")] * len(keys)
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * len(keys)),
            }
        ),
        f"{tmp}/orders.parquet",
    )
    return tmp


@pytest.mark.parametrize(
    "prices,keys",
    [
        ([500.0] * 20, list(range(20, 0, -1))),  # constant: 1 partition
        ([3.0, 1.0, 2.0], [30, 10, 20]),         # n < 4: NTILE degenerate
    ],
)
def test_global_price_rank_degenerate(ray_session, prices, keys):
    """Skew-degenerate sample (all prices equal => every row in one
    range partition) and n < 4 (size4 == 0 NTILE branch) must both stay
    oracle-exact."""
    import duckdb

    from well_duplicates_ray.pipelines import queries as q

    tmp = _rank_tmp_dir(prices, keys)
    got = _sorted_df(q.global_price_rank(tmp))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp}/orders.parquet')"
    )
    want = _sorted_df(con.sql(q.SQL_ORACLES["global_price_rank"]).df())
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def test_top_tokens_per_lang_oracle(ray_session):
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["top_tokens_per_lang"])
    got = _sorted_df(q.top_tokens_per_lang(SF_DIR))
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # at most K rows per lang, counts non-increasing within each lang
    assert got.groupby("lang").size().max() <= q.TOP_TOKENS_PER_LANG_K


def test_region_priority_matrix_oracle(ray_session):
    """Dense cross-join output: every (region, priority) cell present,
    zeros preserved, bit-equal to the SQL CROSS JOIN + LEFT JOIN."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["region_priority_matrix"])
    got = _sorted_df(q.region_priority_matrix(SF_DIR))
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # density: |regions| x |priorities| rows exactly
    assert len(got) == got["r_name"].nunique() * \
        got["o_orderpriority"].nunique()


def test_acctbal_bands_actually_overlap(ray_session):
    """The bands are a RANGE join, not a partition: total matched rows
    must exceed the number of distinct customers that match any band
    (some customers land in two bands)."""
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    got = _sorted_df(q.acctbal_band_counts(SF_DIR))
    bal = pq.read_table(
        f"{SF_DIR}/customer.parquet", columns=["c_acctbal"]
    )["c_acctbal"].to_numpy()
    import numpy as np

    matched = np.zeros(len(bal), dtype=bool)
    for _, lo, hi in q.ACCTBAL_BANDS:
        matched |= (bal >= lo) & (bal < hi)
    assert got["n_customers"].sum() > matched.sum()


def test_event_type_transitions_oracle(ray_session):
    """Markov transition counts: LAG over a categorical column, per-task
    pre-aggregation to <= |types|^2 rows, bit-equal to the SQL LAG +
    GROUP BY restatement."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["event_type_transitions"])
    got = _sorted_df(q.event_type_transitions(SF_DIR))
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # each user's stream of n events contributes exactly n-1 transitions
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["user_id"]
    )["user_id"].to_numpy()
    import numpy as np

    n_users = np.unique(ev).size
    assert got["n_transitions"].sum() == len(ev) - n_users


def test_event_type_transitions_single_event_users(ray_session, tmp_path):
    """Users with exactly one event contribute NO transition rows (the
    segment-first mask), and an empty partition yields a clean empty
    table rather than a schema-less block crash."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    n = 6
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(
                np.arange(n) * 1_000_000, pa.timestamp("us")
            ),
            "user_id": pa.array([1, 2, 3, 4, 4, 4], pa.int64()),
            "event_type": pa.array(
                ["a", "b", "c", "a", "b", "a"], pa.string()
            ),
        }
    )
    pq.write_table(t, d / "events.parquet")
    got = _sorted_df(q.event_type_transitions(str(d)))
    # only user 4 has >1 event: a->b then b->a
    assert got["n_transitions"].sum() == 2
    assert set(zip(got["prev_type"], got["next_type"])) == {
        ("a", "b"), ("b", "a"),
    }


def test_order_price_median_cont_oracle(ray_session):
    """PERCENTILE_CONT(0.5) via the pinned (lo+hi)/200.0 restatement:
    bit-exact (check_exact), not approximately equal."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["order_price_median_cont"])
    got = _sorted_df(q.order_price_median_cont(SF_DIR))
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_exact=True
    )


def test_order_price_median_cont_interpolation(ray_session, tmp_path):
    """Even-sized groups interpolate between the two middles; odd sizes
    return the exact middle; a single-row group returns its value."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    t = pa.table(
        {
            "o_orderpriority": pa.array(
                ["E", "E", "O", "O", "O", "S"], pa.string()
            ),
            "o_totalprice": pa.array(
                [10.0, 20.0, 10.0, 20.0, 40.0, 7.5], pa.float64()
            ),
        }
    )
    pq.write_table(t, d / "orders.parquet")
    got = _sorted_df(q.order_price_median_cont(str(d)))
    med = dict(zip(got["o_orderpriority"], got["median_price"]))
    assert med == {"E": 15.0, "O": 20.0, "S": 7.5}
    assert dict(zip(got["o_orderpriority"], got["n_rows"])) == {
        "E": 2, "O": 3, "S": 1,
    }


def test_qty_price_corr_oracle(ray_session):
    """Grouped Pearson CORR over exact integer second moments: bit-exact
    vs the HUGEINT SQL restatement (check_exact)."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["qty_price_corr_by_flag"])
    got = _sorted_df(q.qty_price_corr_by_flag(SF_DIR))
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_exact=True
    )


def test_qty_price_corr_constant_column_is_null(ray_session, tmp_path):
    """A group with zero variance on either side yields NULL (the
    denominator guard), never a ZeroDivisionError or inf; a varying
    group matches the closed form computed independently."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    t = pa.table(
        {
            "l_returnflag": pa.array(
                ["C", "C", "C", "V", "V", "V"], pa.string()
            ),
            "l_quantity": pa.array(
                [5.0, 5.0, 5.0, 1.0, 2.0, 3.0], pa.float64()
            ),
            "l_extendedprice": pa.array(
                [10.0, 20.0, 30.0, 10.0, 20.0, 35.0], pa.float64()
            ),
        }
    )
    pq.write_table(t, d / "lineitem.parquet")
    got = _sorted_df(q.qty_price_corr_by_flag(str(d)))
    by_flag = dict(zip(got["l_returnflag"], got["corr_qty_price"]))
    assert math.isnan(by_flag["C"]) or by_flag["C"] is None
    # independent closed form for the varying group
    x = np.array([1, 2, 3], dtype=object)
    y = np.array([10, 20, 35], dtype=object)
    n, sx, sy = 3, int(x.sum()), int(y.sum())
    sxx, syy, sxy = int((x * x).sum()), int((y * y).sum()), int((x * y).sum())
    want_v = float(n * sxy - sx * sy) / (
        math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(float(n * syy - sy * sy))
    )
    assert by_flag["V"] == want_v


def test_user_value_drift_oracle(ray_session):
    """FIRST_VALUE/LAST_VALUE frame: one row per user, endpoints from a
    single sorted pass, bit-equal to the SQL window restatement."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["user_value_drift"])
    got = _sorted_df(q.user_value_drift(SF_DIR))
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # internal consistency: drift is exactly last - first, one row/user
    assert (got["drift_cents"]
            == got["last_cents"] - got["first_cents"]).all()
    assert got["user_id"].is_unique


def test_qty_price_regr_oracle(ray_session):
    """Grouped REGR_SLOPE/REGR_INTERCEPT over exact integer moments:
    bit-exact vs the HUGEINT SQL restatement (check_exact)."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["qty_price_regr_by_flag"])
    got = _sorted_df(q.qty_price_regr_by_flag(SF_DIR))
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_exact=True
    )


def test_qty_price_regr_constant_x_is_null(ray_session, tmp_path):
    """Zero x-variance (vertical line) yields NULL slope AND intercept —
    the den>0 guard — while a varying group matches the closed forms
    (including the single-division intercept identity) computed
    independently."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    t = pa.table(
        {
            "l_returnflag": pa.array(
                ["C", "C", "C", "V", "V", "V"], pa.string()
            ),
            "l_quantity": pa.array(
                [5.0, 5.0, 5.0, 1.0, 2.0, 4.0], pa.float64()
            ),
            "l_extendedprice": pa.array(
                [10.0, 20.0, 30.0, 10.0, 20.0, 35.0], pa.float64()
            ),
        }
    )
    pq.write_table(t, d / "lineitem.parquet")
    got = _sorted_df(q.qty_price_regr_by_flag(str(d)))
    by_flag = got.set_index("l_returnflag")
    assert math.isnan(by_flag.loc["C", "slope_price_per_qty"])
    assert math.isnan(by_flag.loc["C", "intercept_price"])
    n, sx, sy = 3, 1 + 2 + 4, 10 + 20 + 35
    sxx, sxy = 1 + 4 + 16, 10 + 40 + 140
    den = n * sxx - sx * sx
    assert by_flag.loc["V", "slope_price_per_qty"] == float(
        n * sxy - sx * sy
    ) / float(den)
    assert by_flag.loc["V", "intercept_price"] == float(
        sy * sxx - sx * sxy
    ) / float(den)


def test_orders_above_cust_avg_oracle(ray_session):
    """Decorrelated correlated-subquery: one custkey-hash shuffle, no
    join — bit-exact vs the exact-integer SQL restatement."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["orders_above_cust_avg"])
    assert len(want) > 0
    got = _sorted_df(q.orders_above_cust_avg(SF_DIR))
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_orders_above_cust_avg_strictness(ray_session, tmp_path):
    """Semantics pinned on a hand-built table: a single-order customer
    is never above their own average (strict >), an order exactly AT
    the average is excluded, and only strictly-above orders survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    t = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([7, 7, 7, 9], pa.int64()),
            # cust 7: avg = 20.00 -> order 3 (30.00) strictly above,
            # order 2 (20.00) is a tie at the average -> excluded;
            # cust 9: single order == its own average -> excluded.
            "o_totalprice": pa.array([10.0, 20.0, 30.0, 55.5], pa.float64()),
        }
    )
    pq.write_table(t, d / "orders.parquet")
    got = _sorted_df(q.orders_above_cust_avg(str(d)))
    assert got["o_orderkey"].tolist() == [3]
    assert got["o_totalprice"].tolist() == [30.0]


def test_nation_bag_setops_oracle(ray_session):
    """INTERSECT ALL / EXCEPT ALL (bag semantics): the join-free
    count-merge-expand must reproduce DuckDB's multiset exactly,
    duplicates included."""
    from well_duplicates_ray.pipelines import queries as q

    for name in ("nation_intersect_all", "nation_except_all"):
        want = _oracle_df(q.SQL_ORACLES[name])
        assert len(want) > 0  # non-vacuous on the testdata
        got = _sorted_df(q.SQL_QUERIES[name](SF_DIR))
        pd.testing.assert_frame_equal(
            got, want.astype(got.dtypes.to_dict())
        )


def test_bag_setop_multiplicity_and_chunking(ray_session, tmp_path):
    """Bag multiplicities pinned on a hand-built table, with the
    re-expansion chunk forced tiny (3) so a key's multiplicity spans
    several chunk rows — the hot-key split path — and must still
    reassemble to exactly min(ca, cb) / max(ca - cb, 0) copies."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({"c_nationkey": pa.array([1] * 10 + [2] * 2, pa.int64())}),
        d / "customer.parquet",
    )
    pq.write_table(
        pa.table({"s_nationkey": pa.array([1] * 7 + [3], pa.int64())}),
        d / "supplier.parquet",
    )
    inter = sorted(
        q._bag_setop(str(d), "intersect", chunk=3)
        .to_pandas()["nationkey"].tolist()
    )
    assert inter == [1] * 7  # min(10, 7), reassembled from chunks 3+3+1
    exc = sorted(
        q._bag_setop(str(d), "except", chunk=3)
        .to_pandas()["nationkey"].tolist()
    )
    assert exc == [1] * 3 + [2] * 2  # 10-7 and 2-0; key 3 never emits


def test_rich_contacts_full_outer_oracle(ray_session):
    """FULL OUTER JOIN + COALESCE zero-fill via tagged-union count
    merge: bit-exact vs SQL, with the supplier-missing outer direction
    genuinely exercised on the testdata."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["rich_contacts_full_outer"])
    got = _sorted_df(q.rich_contacts_full_outer(SF_DIR))
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    assert (got["n_supp"] == 0).any()  # outer rows present, zero-filled


def test_rich_contacts_full_outer_both_directions(ray_session, tmp_path):
    """Both outer directions pinned on a hand-built table: a nation
    with only a rich customer, one with only a rich supplier, one with
    both, and an all-poor nation that must NOT appear."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "c_nationkey": pa.array([1, 3, 3, 4], pa.int64()),
                "c_acctbal": pa.array(
                    [9500.0, 9500.0, 9600.0, 100.0], pa.float64()
                ),
            }
        ),
        d / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_nationkey": pa.array([2, 3, 4], pa.int64()),
                "s_acctbal": pa.array([9500.0, 9500.0, 50.0], pa.float64()),
            }
        ),
        d / "supplier.parquet",
    )
    got = _sorted_df(q.rich_contacts_full_outer(str(d)))
    assert sorted(got.to_dict("records"), key=lambda r: r["nationkey"]) == [
        {"n_cust": 1, "n_supp": 0, "nationkey": 1},  # customer-only outer
        {"n_cust": 0, "n_supp": 1, "nationkey": 2},  # supplier-only outer
        {"n_cust": 2, "n_supp": 1, "nationkey": 3},  # inner
    ]  # nation 4 (all poor) absent


def test_order_price_rank_ties_oracle(ray_session):
    """Tie-aware RANK/DENSE_RANK via sample-sort: bit-exact vs the SQL
    window restatement over the full orders table."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["order_price_rank_ties"])
    got = _sorted_df(q.order_price_rank_ties(SF_DIR))
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_order_price_rank_ties_heavy_ties(ray_session, tmp_path):
    """The testdata is nearly tie-free, so tie semantics are pinned on
    a hand-built table with big tie groups spread across partitions:
    RANK jumps by group size, DENSE_RANK increments by one, and
    value-routing keeps every tie group's rank identical even though
    the 14 rows span multiple sample-sort partitions."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    prices = [10.0] * 5 + [20.0] * 4 + [30.0] * 4 + [40.0]
    keys = list(range(1, 15))
    # shuffle file order so partitions don't trivially align with groups
    perm = [3, 13, 7, 0, 10, 5, 1, 12, 8, 4, 11, 2, 9, 6]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([keys[i] for i in perm], pa.int64()),
                "o_totalprice": pa.array(
                    [prices[i] for i in perm], pa.float64()
                ),
            }
        ),
        d / "orders.parquet",
    )
    got = (
        q.order_price_rank_ties(str(d))
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    want_rank = {10.0: 1, 20.0: 6, 30.0: 10, 40.0: 14}
    want_dense = {10.0: 1, 20.0: 2, 30.0: 3, 40.0: 4}
    by_key = dict(zip(keys, prices))
    assert got["rnk"].tolist() == [
        want_rank[by_key[k]] for k in got["o_orderkey"]
    ]
    assert got["drnk"].tolist() == [
        want_dense[by_key[k]] for k in got["o_orderkey"]
    ]


def test_large_volume_orders_join_path_matches_broadcast(ray_session):
    """The above-gate hash-join attach must produce the identical
    top-100 table as the broadcast index_in attach (same sort, same
    tie-break), and the empty-HAVING edge returns a typed empty table."""
    import pyarrow as pa

    from well_duplicates_ray.pipelines import queries as q

    base = _sorted_df(q.large_volume_orders(SF_DIR))
    assert len(base) > 0

    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(q, "Q18_ATTACH_GATE", 0)
        joined = _sorted_df(q.large_volume_orders(SF_DIR))
    finally:
        mp.undo()
    pd.testing.assert_frame_equal(base, joined)

    # empty edge: no order reaches the cutoff -> schema-stable empty
    try:
        mp.setattr(q, "LARGE_QTY_CUTOFF", 10**9)
        empty = q.large_volume_orders(SF_DIR)
    finally:
        mp.undo()
    assert isinstance(empty, pa.Table) and len(empty) == 0
    assert empty.column_names == [
        "c_name", "o_custkey", "o_orderkey", "o_orderdate",
        "o_totalprice", "sum_qty",
    ]


def test_pct_rank_tie_semantics(ray_session, tmp_path):
    """PERCENT_RANK/CUME_DIST on a hand-built heavy-ties table spanning
    multiple sample-sort partitions: pct = (rank-1)/(n-1) of the tie
    group's shared rank, cume = (rows <= value)/n."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    prices = [10.0] * 5 + [20.0] * 4 + [30.0] * 4 + [40.0]
    keys = list(range(1, 15))
    perm = [3, 13, 7, 0, 10, 5, 1, 12, 8, 4, 11, 2, 9, 6]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([keys[i] for i in perm], pa.int64()),
                "o_totalprice": pa.array(
                    [prices[i] for i in perm], pa.float64()
                ),
            }
        ),
        d / "orders.parquet",
    )
    got = (
        q.order_price_pct_rank(str(d))
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    want_pct = {10.0: 0.0, 20.0: 5 / 13, 30.0: 9 / 13, 40.0: 13 / 13}
    want_cume = {10.0: 5 / 14, 20.0: 9 / 14, 30.0: 13 / 14, 40.0: 1.0}
    by_key = dict(zip(keys, prices))
    assert got["pct_rank"].tolist() == [
        want_pct[by_key[k]] for k in got["o_orderkey"]
    ]
    assert got["cume_dist"].tolist() == [
        want_cume[by_key[k]] for k in got["o_orderkey"]
    ]


def test_cust_order_count_histogram_zero_bucket(ray_session, tmp_path):
    """Customers with no orders must land in an explicit n_orders=0
    bucket (the synthetic sf tables never exercise it: every customer
    orders)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64())}),
        d / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12], pa.int64()),
                "o_custkey": pa.array([1, 1, 2], pa.int64()),
            }
        ),
        d / "orders.parquet",
    )
    got = {
        r["n_orders"]: r["n_cust"]
        for r in q.cust_order_count_histogram(str(d)).to_pylist()
    }
    assert got == {2: 1, 1: 1, 0: 3}


def test_late_ship_join_path_matches_broadcast(ray_session):
    """The above-gate hash-join path must produce the identical grouped
    counts as the broadcast index_in attach."""
    from well_duplicates_ray.pipelines import queries as q

    base = _sorted_df(q.late_ship_priority_counts(SF_DIR))
    assert len(base) > 0 and base["n_orders"].sum() > 0

    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(q, "Q4_ATTACH_GATE", 0)
        joined = _sorted_df(q.late_ship_priority_counts(SF_DIR))
    finally:
        mp.undo()
    pd.testing.assert_frame_equal(base, joined)


def test_returned_customer_topk_join_path_matches_broadcast(ray_session):
    """The above-gate hash-join path must produce the identical top-20
    table as the broadcast window-orders attach."""
    from well_duplicates_ray.pipelines import queries as q

    base = _sorted_df(q.returned_customer_topk(SF_DIR))
    assert len(base) > 0

    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(q, "Q10_ATTACH_GATE", 0)
        joined = _sorted_df(q.returned_customer_topk(SF_DIR))
    finally:
        mp.undo()
    pd.testing.assert_frame_equal(base, joined)


def test_nation_trade_matrix_join_paths_match_broadcast(ray_session):
    """Forcing BOTH gates to the hash-join paths (orders attach and
    customer-nation attach) must reproduce the broadcast result."""
    from well_duplicates_ray.pipelines import queries as q

    base = _sorted_df(q.nation_trade_matrix(SF_DIR))
    assert len(base) > 0

    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(q, "Q10_ATTACH_GATE", 0)
        mp.setattr(q, "Q7_CUST_GATE", 0)
        joined = _sorted_df(q.nation_trade_matrix(SF_DIR))
    finally:
        mp.undo()
    pd.testing.assert_frame_equal(base, joined)


def test_nation_market_share_join_paths_match_broadcast(ray_session):
    """Forcing the orders attach to a hash join and the region filter
    to a custkey semi-join must reproduce the broadcast result."""
    from well_duplicates_ray.pipelines import queries as q

    base = _sorted_df(q.nation_market_share(SF_DIR))
    assert len(base) > 0

    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(q, "Q10_ATTACH_GATE", 0)
        mp.setattr(q, "Q7_CUST_GATE", 0)
        joined = _sorted_df(q.nation_market_share(SF_DIR))
    finally:
        mp.undo()
    pd.testing.assert_frame_equal(base, joined)


def test_top_supplier_revenue_returns_all_ties(ray_session, tmp_path):
    """Q15's argmax must return EVERY tied winner (sf data has a unique
    max, so ties are pinned on a hand-built table: suppliers 1 and 2
    gross identical cents inside the quarter; 3 trails; 4 ships only
    outside the window)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    import pandas as _pd

    ts = pa.array(
        [_pd.Timestamp(x) for x in
         ["1996-02-01", "1996-02-02", "1996-03-01", "1996-02-10",
          "1999-01-01"]],
        pa.timestamp("us"),
    )
    pq.write_table(
        pa.table(
            {
                "l_suppkey": pa.array([1, 2, 2, 3, 4], pa.int64()),
                "l_shipdate": ts,
                "l_extendedprice": pa.array(
                    [200.0, 150.0, 50.0, 60.0, 999.0], pa.float64()
                ),
                "l_discount": pa.array([0.0] * 5, pa.float64()),
            }
        ),
        d / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
                "s_name": pa.array(
                    ["s1", "s2", "s3", "s4"], pa.string()
                ),
            }
        ),
        d / "supplier.parquet",
    )
    got = q.top_supplier_revenue(str(d)).to_pylist()
    assert sorted((r["s_suppkey"], r["total_revenue_cents"]) for r in got) \
        == [(1, 20000), (2, 20000)]


def test_top_term_per_doc_join_path_matches_broadcast(ray_session):
    """Forcing the df attach to the token hash join + doc-hash
    partitioned argmax must reproduce the broadcast per-batch argmax."""
    from well_duplicates_ray.pipelines import queries as q

    base = _sorted_df(q.top_term_per_doc(SF_DIR))
    assert len(base) > 0

    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(q, "DF_BROADCAST_GATE", 0)
        joined = _sorted_df(q.top_term_per_doc(SF_DIR))
    finally:
        mp.undo()
    pd.testing.assert_frame_equal(base, joined)
