"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

_FLAGSHIP_N = 2000  # sf0.001-scale synthetic image+caption table
_FLAGSHIP_SEED = 42


def _flagship_input_path() -> str:
    """Deterministic synthetic image table, cached as parquet in /tmp
    (FIXTURES.md F1 — seed-pinned, no external data). The build is
    atomic and the cached file is validated before reuse (cachefs), so
    concurrent driver processes and stale/corrupt leftovers are safe."""
    from well_duplicates_ray.cachefs import ensure_cached
    from well_duplicates_ray.fixtures import FIXTURE_VERSION, write_images_parquet

    path = (f"/tmp/wd_cache/images_n{_FLAGSHIP_N}_s{_FLAGSHIP_SEED}"
            f"_v{FIXTURE_VERSION}.parquet")
    return ensure_cached(
        path, lambda: write_images_parquet(path, n=_FLAGSHIP_N,
                                           seed=_FLAGSHIP_SEED)
    )


def entry() -> Any:
    """Flagship near-dup detection + clustering pipeline (SURVEY.md §7.0)
    on the sf0.001-scale synthetic image+caption table; returns the
    cluster-assignment Dataset (image_id, component)."""
    from well_duplicates_ray.config import DedupConfig
    from well_duplicates_ray.io import read_table
    from well_duplicates_ray.pipelines.neardup import run_neardup

    ds = read_table(_flagship_input_path())
    out = run_neardup(ds, DedupConfig(), num_partitions=16,
                      collect_metrics=False)
    return out["clusters"]


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from well_duplicates_ray.pipelines.queries import SQL_QUERIES

    out: dict[str, Callable[[str], Any]] = dict(SQL_QUERIES)
    try:
        from well_duplicates_ray.pipelines.queries import EXTRA_QUERIES

        out.update(EXTRA_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; keys missing
    here (the near-dup/sketch/model ops) get the driver's weaker
    rows-only check."""
    from well_duplicates_ray.pipelines.queries import SQL_ORACLES

    return dict(SQL_ORACLES)
