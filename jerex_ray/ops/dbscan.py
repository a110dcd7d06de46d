"""Grid-bucketed DBSCAN over integer 2-D points (Ester et al. '96).

Density-based clustering as a Ray dataflow: ε-neighbor pairs come
from a 3×3 cell-neighborhood self-join (cell size = ε, so any pair
within ε lands in adjacent cells), core points from the neighbor
count, clusters from the BSP connected-components grid over the
core–core graph, and border points attach to the MINIMUM cluster id
among their core neighbors (the deterministic variant of DBSCAN's
order-dependent border assignment — documented divergence from the
textbook's "first reached wins").

Determinism/exactness: coordinates and ε are integers, the neighbor
predicate is the exact integer comparison dx²+dy² ≤ ε², and every
label is a min-id — no float boundary can flip a membership, so a
SQL all-pairs + recursive-closure oracle matches bit-for-bit.

Scale notes: the pair stage replicates each point to its 9
neighboring cells (×9 point rows through ONE hash co-location — no
all-pairs join ever materializes; per-cell population bounds the
quadratic term, so ε must be chosen below the data's density scale).
The per-node count/core/component tables are node-vocabulary-bounded
and use the same broadcast contract as the HITS/PageRank/WL node
vectors; for corpora whose point count exceeds driver memory the
core filter and border join swap to the distributed semi-join
pattern of ``ops/dedup.minhash_verified_edges``.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

_PAIR_EMPTY = pd.DataFrame({"a": pd.Series(dtype="int64"),
                            "b": pd.Series(dtype="int64")})


def dbscan_2d(points_ds, *, id_col: str = "id", x_col: str = "x",
              y_col: str = "y", eps: int = 2, min_pts: int = 3,
              num_partitions: int | None = None) -> pd.DataFrame:
    """points Dataset (integer id/x/y) → (id, role, cluster) frame:
    role ∈ {core, border, noise}; cluster = min core-member id of the
    density-connected component (−1 for noise)."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.functions.components import connected_components_ds

    eps2 = int(eps) * int(eps)

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id": pd.Series(dtype="int64"),
                              "x": pd.Series(dtype="int64"),
                              "y": pd.Series(dtype="int64"),
                              "cx": pd.Series(dtype="int64"),
                              "cy": pd.Series(dtype="int64"),
                              "home": pd.Series(dtype="bool")})
        if df.empty:
            return empty
        ids = df[id_col].to_numpy(np.int64)
        x = df[x_col].to_numpy(np.int64)
        y = df[y_col].to_numpy(np.int64)
        cx0 = np.floor_divide(x, eps)
        cy0 = np.floor_divide(y, eps)
        frames = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                frames.append(pd.DataFrame({
                    "id": ids, "x": x, "y": y,
                    "cx": cx0 + dx, "cy": cy0 + dy,
                    "home": dx == 0 and dy == 0}))
        return pd.concat(frames, ignore_index=True)

    def pair_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _PAIR_EMPTY
        outs = []
        for _, g in df.groupby(["cx", "cy"], sort=False):
            h = g[g["home"]]
            if h.empty or len(g) < 2:
                continue
            m = h[["id", "x", "y"]].merge(g[["id", "x", "y"]],
                                          how="cross")
            dx = m["x_x"].to_numpy(np.int64) - m["x_y"].to_numpy(np.int64)
            dy = m["y_x"].to_numpy(np.int64) - m["y_y"].to_numpy(np.int64)
            keep = ((m["id_x"].to_numpy(np.int64)
                     < m["id_y"].to_numpy(np.int64))
                    & (dx * dx + dy * dy <= eps2))
            if keep.any():
                outs.append(pd.DataFrame(
                    {"a": m["id_x"].to_numpy(np.int64)[keep],
                     "b": m["id_y"].to_numpy(np.int64)[keep]}))
        if not outs:
            return _PAIR_EMPTY
        return pd.concat(outs, ignore_index=True)

    rep = points_ds.map_batches(replicate, batch_format="pandas")
    # the min-id endpoint's HOME cell emits each pair exactly once
    pairs = grouped_apply(rep, ["cx", "cy"], pair_block,
                          num_partitions=num_partitions).materialize()

    def expl(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"u": pd.Series(dtype="int64")})
        return pd.DataFrame({"u": np.concatenate(
            [df["a"].to_numpy(np.int64), df["b"].to_numpy(np.int64)])})

    cnt = grouped_aggregate(
        pairs.map_batches(expl, batch_format="pandas"),
        ["u"], {"n": (None, "count")},
        num_partitions=num_partitions).to_pandas()
    ids_all = points_ds.map_batches(
        lambda df: pd.DataFrame({"id": df[id_col]}),
        batch_format="pandas").to_pandas()["id"].astype("int64")
    nmap = dict(zip(cnt["u"].astype("int64"), cnt["n"].astype("int64"))) \
        if not cnt.empty else {}
    core = {int(i) for i in ids_all
            if nmap.get(int(i), 0) + 1 >= min_pts}

    def core_edges(df: pd.DataFrame, _c=core) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return _PAIR_EMPTY
        return df[df["a"].isin(_c) & df["b"].isin(_c)]

    comp_df = connected_components_ds(
        pairs.map_batches(core_edges, batch_format="pandas"),
        src="a", dst="b").to_pandas()
    comp = dict(zip(comp_df["node"].astype("int64"),
                    comp_df["component"].astype("int64"))) \
        if not comp_df.empty and "node" in comp_df.columns else {}
    for c in core:            # isolated core: its own cluster
        comp.setdefault(c, c)

    def border_rows(df: pd.DataFrame, _c=core) -> pd.DataFrame:
        empty = pd.DataFrame({"u": pd.Series(dtype="int64"),
                              "cl": pd.Series(dtype="int64")})
        if df.empty or "a" not in df.columns:
            return empty
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        ain = df["a"].isin(_c).to_numpy()
        bin_ = df["b"].isin(_c).to_numpy()
        us = np.concatenate([a[~ain & bin_], b[ain & ~bin_]])
        cs = np.concatenate([b[~ain & bin_], a[ain & ~bin_]])
        if not len(us):
            return empty
        return pd.DataFrame({"u": us,
                             "cl": pd.Series(cs).map(comp)
                             .to_numpy(np.int64)})

    bmin = grouped_aggregate(
        pairs.map_batches(border_rows, batch_format="pandas"),
        ["u"], {"cl": ("cl", "min")},
        num_partitions=num_partitions).to_pandas()
    border = dict(zip(bmin["u"].astype("int64"),
                      bmin["cl"].astype("int64"))) \
        if not bmin.empty and "u" in bmin.columns else {}

    rows = []
    for i in sorted(int(v) for v in ids_all):
        if i in core:
            rows.append((i, "core", comp[i]))
        elif i in border:
            rows.append((i, "border", border[i]))
        else:
            rows.append((i, "noise", -1))
    return pd.DataFrame(rows, columns=["id", "role", "cluster"]) \
        .astype({"id": "int64", "cluster": "int64"})
