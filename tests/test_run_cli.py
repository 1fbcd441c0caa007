"""CLI smoke tests for the `ray job submit` entry point (north_rule
surface; SURVEY.md §2 R12): run main() on a tiny fixture in both
streaming and --checkpoint modes and assert the JSON summary + outputs.
The session-scoped Ray fixture owns the session, so main() must not
re-init (it only inits when no session exists)."""

import json
import os

import pyarrow.parquet as pq
import pytest

from well_duplicates_ray.run import build_parser, main


@pytest.fixture(scope="module")
def tiny_input(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    path = str(d / "images.parquet")
    from well_duplicates_ray.fixtures import write_images_parquet

    write_images_parquet(path, n=300, seed=42)
    return path


def test_cli_streaming(ray_session, tiny_input, tmp_path, capsys):
    out_dir = str(tmp_path / "out")
    rc = main(["--input", tiny_input, "--output", out_dir])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["mode"] == "streaming"
    assert summary["n_rows"] == 300
    clusters = pq.read_table(f"{out_dir}/clusters")
    assert clusters.num_rows == 300
    assert set(clusters.column_names) == {"image_id", "component"}
    edges = pq.read_table(f"{out_dir}/edges")
    assert summary["n_edges"] == edges.num_rows > 0


def test_cli_checkpoint(ray_session, tiny_input, tmp_path, capsys):
    out_dir = str(tmp_path / "ckpt")
    rc = main(["--input", tiny_input, "--output", out_dir, "--checkpoint"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["mode"] == "checkpoint"
    assert summary["partitions_computed"] >= 1
    assert os.path.isdir(summary["clusters_path"])
    clusters = pq.read_table(summary["clusters_path"])
    assert clusters.num_rows == 300


def test_cli_config_overrides_parse():
    args = build_parser().parse_args(
        ["--input", "a", "--output", "b", "--shingle-k", "7",
         "--jaccard-threshold", "0.5", "--phash-radius", "2"]
    )
    assert (args.shingle_k, args.jaccard_threshold, args.phash_radius) == (
        7, 0.5, 2,
    )


def test_lance_seam_dispatch():
    """The .lance URI path dispatches to ray.data.read_lance when the
    package exists and raises a clear ImportError when it doesn't (the
    sandbox has no lance; the seam itself must still be testable)."""
    from well_duplicates_ray.io import read_table

    try:
        import lance  # noqa: F401

        has_lance = True
    except ImportError:
        has_lance = False
    if not has_lance:
        with pytest.raises(ImportError, match="lance"):
            read_table("/tmp/nonexistent/table.lance")


def test_lance_write_seam_dispatch(ray_session):
    """write_table mirrors the read seam: a .lance output URI dispatches
    to Dataset.write_lance (or raises the clear ImportError without the
    package); non-lance paths still write parquet directories."""
    import pyarrow as pa
    import ray.data

    from well_duplicates_ray.io import write_table

    ds = ray.data.from_arrow(pa.table({"x": pa.array([1, 2, 3])}))
    try:
        import lance  # noqa: F401

        has_lance = True
    except ImportError:
        has_lance = False
    if not has_lance:
        with pytest.raises(ImportError, match="lance"):
            write_table(ds, "/tmp/wd_lance_seam/out.lance")
    import glob
    import shutil

    out = "/tmp/wd_lance_seam/out_pq"
    shutil.rmtree(out, ignore_errors=True)
    write_table(ds, out)
    assert glob.glob(f"{out}/*.parquet")
    shutil.rmtree("/tmp/wd_lance_seam", ignore_errors=True)


def test_cli_empty_input(ray_session, tmp_path, capsys):
    """Zero-row input: streaming mode must produce an empty cluster table,
    not crash on the missing edge table (ADVICE round 1)."""
    import pyarrow as pa

    from well_duplicates_ray.stages.decode import REQUIRED_SCHEMA

    src = str(tmp_path / "empty.parquet")
    empty = pa.table(
        {name: pa.array([], typ) for name, typ in REQUIRED_SCHEMA.items()}
    )
    pq.write_table(empty, src)
    out_dir = str(tmp_path / "out_empty")
    rc = main(["--input", src, "--output", out_dir])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_rows"] == 0


def test_row_format_seam_roundtrip(ray_session, tmp_path):
    """CSV and JSONL extensions dispatch through the same read/write
    seam: a write_table/read_table roundtrip preserves rows, and the
    row-format read prunes columns immediately after the scan."""
    import pyarrow as pa
    import ray.data

    from well_duplicates_ray.io import read_table, write_table

    src = pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "v": pa.array([10.5, 20.25, 30.0], pa.float64()),
            "s": pa.array(["a", "b", "c"], pa.string()),
        }
    )
    for ext in ("csv", "jsonl"):
        out = str(tmp_path / f"t_{ext}.{ext}")
        write_table(ray.data.from_arrow(src), out)
        back = read_table(out).to_pandas().sort_values("k")
        assert back["k"].tolist() == [1, 2, 3]
        assert back["s"].tolist() == ["a", "b", "c"]
        assert back["v"].tolist() == [10.5, 20.25, 30.0]
        pruned = read_table(out, columns=["k", "s"])
        assert sorted(pruned.schema().names) == ["k", "s"]
