import numpy as np
import pyarrow as pa
import pytest


def _dsu_reference(n, edge_list):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return [find(i) for i in range(n)]


def _random_graph(rng, n, m):
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    return list(zip(a[keep].tolist(), b[keep].tolist()))


@pytest.mark.parametrize("path", ["driver", "distributed"])
@pytest.mark.parametrize("shape", ["random", "chain", "star", "empty"])
def test_components_match_reference(ray_session, path, shape):
    import ray.data
    from well_duplicates_ray.stages.components import connected_components

    rng = np.random.default_rng(5)
    n = 120
    if shape == "random":
        edge_list = _random_graph(rng, n, 80)
    elif shape == "chain":
        edge_list = [(i, i + 1) for i in range(0, 12)]  # multi-round diameter
    elif shape == "star":
        edge_list = [(0, i) for i in range(1, 50)]
    else:
        edge_list = []

    want = _dsu_reference(n, edge_list)
    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([a for a, _ in edge_list], pa.int64()),
                "b": pa.array([b for _, b in edge_list], pa.int64()),
            }
        )
    )
    threshold = 10_000_000 if path == "driver" else 0
    out = connected_components(
        edges, nodes, num_partitions=2, driver_threshold=threshold
    )
    got = {r["node"]: r["component"] for r in out.take_all()}
    assert len(got) == n
    for i in range(n):
        assert got[i] == want[i], f"{shape}/{path}: node {i}"
