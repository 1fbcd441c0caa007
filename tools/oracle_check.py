#!/usr/bin/env python
"""Strict local mirror of the driver's CORRECTNESS check: run every
oracle-keyed query through Ray AND DuckDB on the same sf dir and compare
row count, schema (column names), and BIT-EXACT values after sorting
columns by name and rows by value (the driver hashes values, so a float
that differs in the last ulp is a failure — tests/test_queries.py's
rounded comparison would not catch it).

    python tools/oracle_check.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    df = result.to_pandas()
    if df.shape[1] == 0:  # empty ray Dataset loses its schema in to_pandas
        schema = result.schema()
        df = pd.DataFrame(
            {
                n: pd.Series(dtype=t.to_pandas_dtype())
                for n, t in zip(schema.names, schema.types)
            }
        )
    return df


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object or str(df[c].dtype) == "string":
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None,
                    help="write the per-query report as JSON here")
    ns = ap.parse_args()
    sf_dir, out_path = ns.sf_dir, ns.out
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from well_duplicates_ray.pipelines.queries import (
        EXTRA_QUERIES,
        SQL_ORACLES,
        SQL_QUERIES,
    )

    registry = {**SQL_QUERIES, **EXTRA_QUERIES}
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    report: dict[str, dict] = {}
    for name in sorted(SQL_ORACLES):
        try:
            got = normalize(to_pandas(registry[name](sf_dir)))
            want = normalize(con.sql(SQL_ORACLES[name]).df())
            problems = []
            if list(got.columns) != list(want.columns):
                problems.append(f"cols {list(got.columns)} != {list(want.columns)}")
            elif len(got) != len(want):
                problems.append(f"rows {len(got)} != {len(want)}")
            else:
                for c in got.columns:
                    g, w = got[c].to_numpy(), want[c].to_numpy()
                    if str(got[c].dtype) != str(want[c].dtype):
                        problems.append(
                            f"{c}: dtype {got[c].dtype} != {want[c].dtype}"
                        )
                    if not (
                        np.array_equal(g, w)
                        or (g.dtype.kind == "f" and np.array_equal(
                            g, w, equal_nan=True))
                    ):
                        bad = np.flatnonzero(~(g == w))[:3]
                        problems.append(
                            f"{c}: {len(np.flatnonzero(~(g == w)))} diffs, "
                            f"e.g. idx {bad.tolist()} "
                            f"{[(g[i], w[i]) for i in bad.tolist()]}"
                        )
            if problems:
                failures += 1
                print(f"FAIL {name}: {'; '.join(problems)}")
                report[name] = {"rows_match": False, "schema_match": False,
                                "hash_match": False,
                                "err": "; ".join(problems)[:300]}
            else:
                print(f"ok   {name}: {len(got)} rows bit-exact")
                report[name] = {"rows_match": True, "schema_match": True,
                                "hash_match": True, "rows": len(got),
                                "err": None}
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False,
                            "err": f"{type(e).__name__}: {e}"[:300]}

    # rows-only pass over the no-oracle queries (the driver's weaker
    # check for non-SQL-expressible ops): each must RUN and yield a
    # stable-schema result — this is where first-call side effects
    # (IVF store build, /tmp fixtures) would die in the driver's run,
    # so the pre-flight exercises them all (VERDICT r3 top_next)
    for name in sorted(set(registry) - set(SQL_ORACLES)):
        try:
            df = to_pandas(registry[name](sf_dir))
            print(f"ok   {name}: {len(df)} rows (no_oracle)")
            report[name] = {"rows": len(df), "err": "no_oracle"}
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            report[name] = {"rows": None,
                            "err": f"no_oracle; {type(e).__name__}: {e}"[:300]}

    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {out_path} ({len(report)} entries)")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
