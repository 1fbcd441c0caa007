"""Distributed connected components (SURVEY.md §2 G15, §4.3).

The reference never clusters — it only counts per-level duplicates
(``count_well_duplicates.py`` counters, SURVEY.md §2 R10). The graft must
produce cluster assignments, so verified dup pairs are resolved into
components with iterative min-label propagation expressed purely as Ray
Data joins + grouped aggregates — no driver-side union-find, no actors:

  labels(node, label)   init label = node
  each round:
    msgs       = adjacency(key, other) JOIN labels ON key
                 -> (node=other, cand=label)
    new_labels = (msgs UNION labels-as-msgs).groupby(node).min(cand)
  until the label sum stops decreasing (labels are monotone
  non-increasing, so the int64 sum is a safe fixpoint witness).

Rounds = O(component diameter); dup clusters are stars/cliques around a
base row, so a handful of rounds suffice. Component id = min(node).

Nodes are int64 (callers map string ids; the flagship's "img%08d" ids
parse directly). Labels are materialized each round — they are the small
iterative state (16 B/node); at 10^12-node scale each round's labels
would instead be checkpointed to the manifest store (SURVEY.md G18).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min, Sum


def connected_components(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    num_partitions: int = 16,
    max_rounds: int = 50,
) -> ray.data.Dataset:
    """edges: (a:int64, b:int64); nodes: (node:int64) including singletons.

    Returns (node:int64, component:int64) with component = min node of the
    connected component.
    """

    def to_adjacency(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        return pa.table(
            {
                "key": pa.array(np.concatenate([a, b])),
                "other": pa.array(np.concatenate([b, a])),
            }
        )

    adjacency = edges.map_batches(to_adjacency, batch_format="pyarrow").materialize()

    labels = nodes.map_batches(
        lambda t: pa.table({"node": t["node"], "label": t["node"]}),
        batch_format="pyarrow",
    ).materialize()

    prev_sum = None
    for _ in range(max_rounds):
        lab_keyed = labels.rename_columns({"node": "key"})
        joined = adjacency.join(
            lab_keyed, "inner", num_partitions, on=("key",)
        )
        msgs = joined.map_batches(
            lambda t: pa.table({"node": t["other"], "cand": t["label"]}),
            batch_format="pyarrow",
        )
        self_msgs = labels.map_batches(
            lambda t: pa.table({"node": t["node"], "cand": t["label"]}),
            batch_format="pyarrow",
        )
        new_labels = (
            msgs.union(self_msgs)
            .groupby("node")
            .aggregate(Min("cand", alias_name="label"))
            .materialize()
        )
        cur = new_labels.aggregate(Sum("label", alias_name="s"))["s"]
        labels = new_labels
        if prev_sum is not None and cur == prev_sum:
            break
        prev_sum = cur
    else:
        raise RuntimeError(f"components did not converge in {max_rounds} rounds")

    return labels.rename_columns({"label": "component"})
