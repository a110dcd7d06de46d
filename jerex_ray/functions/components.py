"""Distributed connected components by iterative min-label propagation.

The scale path for near-duplicate clustering (ray_guide §Aggregation:
"connected components — iterate a few rounds of min-label propagation
with groupby, or union-find on the driver only if the candidate set is
provably small"). ``minhash_dedup`` uses the driver-side star collapse
for its (small) verified edge sets; this operator handles edge sets too
large to collect.

Algorithm (label propagation / "hash-min", standard from the
large-scale graph literature): every node starts with label = node id;
each round, every node adopts the minimum label in its closed
neighborhood; converges in O(diameter) rounds. Each round is one
combiner aggregate over the edge list — no driver-side state beyond a
changed-counter.
"""

from __future__ import annotations

import pandas as pd

from jerex_ray.functions.aggregate import grouped_aggregate
from jerex_ray.functions.join import broadcast_join


def connected_components(edges_ds, *, src: str = "src", dst: str = "dst",
                         max_rounds: int = 20,
                         num_partitions: int | None = None) -> pd.DataFrame:
    """edges Dataset → (node, component) DataFrame, component = min node
    id of the component.

    The per-round reduce keeps only (node → min neighbor label) rows —
    bounded by the node count, not the edge count. The label table is
    broadcast per round; for graphs whose NODE set exceeds worker
    memory, swap the broadcast for a hash join on node id (the edges
    stay distributed either way)."""
    # symmetrize once; self-loops are harmless
    def sym(df: pd.DataFrame) -> pd.DataFrame:
        a = df[[src, dst]]
        b = df[[dst, src]].rename(columns={dst: src, src: dst})
        return pd.concat([a, b], ignore_index=True)

    sym_edges = edges_ds.map_batches(sym, batch_format="pandas")

    # initial labels: label(node) = node
    labels = grouped_aggregate(
        sym_edges.map_batches(
            lambda df: df.rename(columns={src: "node"})[["node"]]
                         .assign(label=lambda x: x["node"]),
            batch_format="pandas"),
        ["node"], {"label": ("label", "min")},
        num_partitions=num_partitions).to_pandas()

    for _ in range(max_rounds):
        # each node adopts min(label of self, labels of neighbors)
        lab = labels.rename(columns={"node": dst, "label": "nbr_label"})
        with_labels = broadcast_join(sym_edges, lab, left_on=dst,
                                     right_on=dst)
        nbr_min = grouped_aggregate(
            with_labels.map_batches(
                lambda df: df.rename(columns={src: "node"})
                [["node", "nbr_label"]],
                batch_format="pandas"),
            ["node"], {"new_label": ("nbr_label", "min")},
            num_partitions=num_partitions).to_pandas()
        merged = labels.merge(nbr_min, on="node", how="left")
        merged["new_label"] = merged[["label", "new_label"]].min(axis=1)
        changed = int((merged["new_label"] != merged["label"]).sum())
        labels = merged[["node", "new_label"]].rename(
            columns={"new_label": "label"})
        # pointer jumping: label ← label(label), repeated — compresses
        # paths so convergence is O(log diameter) rounds, not O(diameter)
        label_of = dict(zip(labels["node"], labels["label"]))
        for _ in range(2):
            jumped = labels["label"].map(label_of).fillna(labels["label"])
            if (jumped == labels["label"]).all():
                break
            labels["label"] = jumped
            label_of = dict(zip(labels["node"], labels["label"]))
        if changed == 0:
            break

    return labels.rename(columns={"label": "component"}) \
                 .sort_values("node").reset_index(drop=True)
