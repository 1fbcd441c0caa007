"""Round-5 additions, batch D: per-user MODE() aggregate
(``mode_event_type_per_user``), the dow x hour calendar heatmap
(``events_dow_hour``), the exact per-document distinct-shingle
cardinality (``doc_distinct_shingles``), the hopping-window distinct
user count (``hopping_window_users``) and the vectorized regex
occurrence count (``doc_capitalized_count``)."""

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


def test_mode_event_type_oracle(ray_session):
    """Per-user mode: bit-exact vs the QUALIFY ROW_NUMBER restatement."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["mode_event_type_per_user"])
    got = _sorted_df(q.mode_event_type_per_user(SF_DIR))
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_exact=True
    )


def test_mode_event_type_tiebreak(ray_session, tmp_path):
    """Ties go to the lexicographically SMALLEST type regardless of
    first-appearance order in the stream (the dictionary-code remap):
    user 1 sees 'zz' twice then 'aa' twice -> mode 'aa'."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    rows = [
        (1, "zz"), (1, "zz"), (1, "aa"), (1, "aa"),
        (2, "view"), (2, "view"), (2, "click"),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, d / "events.parquet")
    got = _sorted_df(q.mode_event_type_per_user(str(d))).set_index("user_id")
    assert got.loc[1, "mode_type"] == "aa"
    assert got.loc[1, "n"] == 2
    assert got.loc[2, "mode_type"] == "view"
    assert got.loc[2, "n"] == 2


def test_events_dow_hour_oracle(ray_session):
    """Heatmap counts: bit-exact vs DuckDB dayofweek/hour."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["events_dow_hour"])
    got = _sorted_df(q.events_dow_hour(SF_DIR))
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_exact=True
    )


def test_events_dow_hour_epoch_convention(ray_session, tmp_path):
    """1970-01-01 (epoch day 0) was a Thursday: dow 4 in the Sunday=0
    convention; 1970-01-04 was a Sunday: dow 0. Hours are UTC."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    h = 3_600_000_000
    day = 24 * h
    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            # Thu 05:00, Sun 23:00, Sun 23:00 again
            "ts": pa.array([5 * h, 3 * day + 23 * h, 3 * day + 23 * h],
                           pa.timestamp("us")),
            "event_type": pa.array(["a", "a", "a"], pa.string()),
            "value": pa.array([1.0, 1.0, 1.0], pa.float64()),
        }
    )
    pq.write_table(t, d / "events.parquet")
    got = _sorted_df(q.events_dow_hour(str(d)))
    cells = {(r.dow, r.hour): r.n_events for r in got.itertuples()}
    assert cells == {(4, 5): 1, (0, 23): 2}


def test_doc_distinct_shingles_oracle(ray_session):
    """Exact distinct 8-gram counts: bit-exact vs the unnested substr
    COUNT(DISTINCT) (ASCII text, so chars == bytes)."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["doc_distinct_shingles"])
    got = _sorted_df(q.doc_distinct_shingles(SF_DIR))
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_exact=True
    )


def test_doc_distinct_shingles_semantics(ray_session, tmp_path):
    """Hand-computed cases: a doc shorter than 8 chars has 0 shingles;
    'aaaaaaaaa' (9 a's) has exactly 1 distinct 8-gram; 'abcdefgh'
    exactly 1; 'abcdefghi' exactly 2; repetition dedupes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    docs = {
        0: "short",          # len 5 -> 0
        1: "a" * 9,          # 2 windows, both 'aaaaaaaa' -> 1
        2: "abcdefgh",       # exactly one window -> 1
        3: "abcdefghi",      # 2 windows, distinct -> 2
        4: "abcdefgh" * 2,   # 9 windows, 8 distinct rotations + repeat -> 8
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["t"] * len(docs), pa.string()),
            "n_chars": pa.array(
                [len(v) for v in docs.values()], pa.int64()
            ),
        }
    )
    pq.write_table(t, d / "documents.parquet")
    got = _sorted_df(q.doc_distinct_shingles(str(d))).set_index("doc_id")
    assert got["n_shingles"].to_dict() == {0: 0, 1: 1, 2: 1, 3: 2, 4: 8}


def test_hopping_window_users_oracle(ray_session):
    """Hopping-window distinct users: bit-exact vs the CROSS JOIN
    two-hop SQL restatement."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["hopping_window_users"])
    got = _sorted_df(q.hopping_window_users(SF_DIR))
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_exact=True
    )


def test_hopping_window_membership(ray_session, tmp_path):
    """Every event lands in EXACTLY two 30-min windows: the hop it
    falls in and the one before; two events from one user in the same
    hop dedupe to one per window."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from well_duplicates_ray.pipelines import queries as q

    d = tmp_path / "sf"
    d.mkdir()
    hop = q.HOP_US
    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "user_id": pa.array([1, 1, 2], pa.int64()),
            # user 1 twice inside hop 10; user 2 once in hop 11
            "ts": pa.array([10 * hop + 5, 10 * hop + 9, 11 * hop + 1],
                           pa.timestamp("us")),
            "event_type": pa.array(["a", "a", "a"], pa.string()),
            "value": pa.array([1.0, 1.0, 1.0], pa.float64()),
        }
    )
    pq.write_table(t, d / "events.parquet")
    got = _sorted_df(q.hopping_window_users(str(d)))
    cells = {r.win_start_us: r.n_users for r in got.itertuples()}
    # windows 9 and 10 see user 1; windows 10 and 11 see user 2
    assert cells == {9 * hop: 1, 10 * hop: 2, 11 * hop: 1}


def test_doc_capitalized_count_oracle(ray_session):
    """Regex occurrence counts: bit-exact vs DuckDB regexp_extract_all
    (both RE2)."""
    from well_duplicates_ray.pipelines import queries as q

    want = _oracle_df(q.SQL_ORACLES["doc_capitalized_count"])
    got = _sorted_df(q.doc_capitalized_count(SF_DIR))
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_exact=True
    )
