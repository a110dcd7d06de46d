"""TransE knowledge-graph embeddings (Bordes et al. NIPS '13) over
the materialized KG edge table — the canonical downstream consumer of
a KG-construction pipeline (link prediction / entity similarity).

Dataflow per epoch: the (entity-vocab × d) and (predicate-vocab × d)
embedding matrices broadcast once via ``ray.put`` (the same
node-vector contract as HITS/PageRank); ONE streaming pass over the
edge Dataset computes margin-ranking subgradients per triple against
md5-deterministic corrupted tails, emits per-touched-entity partial
gradient rows (d scalar columns), and a combiner reduces them; the
driver applies the SGD step and re-normalizes entity rows to the unit
sphere (the paper's constraint). Everything driver-side is
vocabulary-bounded; edges never leave their blocks.

Determinism: init vectors and negative choices derive from md5 of the
entity/predicate keys (and epoch), so reruns and reshards are
bit-identical. Gradient correctness is finite-difference-tested.
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def _seeded_vec(key: str, d: int) -> np.ndarray:
    """Deterministic N(0, 1/√d)-ish init from md5 bytes (Box-Muller
    over md5-derived uniforms — no global RNG state)."""
    import hashlib
    out = np.empty(d, dtype=np.float64)
    i = 0
    ctr = 0
    while i < d:
        h = hashlib.md5(f"{key}|{ctr}".encode()).digest()
        u1 = (int.from_bytes(h[:8], "big") + 1) / (2.0 ** 64 + 2)
        u2 = (int.from_bytes(h[8:], "big") + 1) / (2.0 ** 64 + 2)
        r = np.sqrt(-2.0 * np.log(u1))
        out[i] = r * np.cos(2.0 * np.pi * u2)
        if i + 1 < d:
            out[i + 1] = r * np.sin(2.0 * np.pi * u2)
        i += 2
        ctr += 1
    return out / np.sqrt(d)


def transe_train(edges_ds, *, dim: int = 16, epochs: int = 3,
                 lr: float = 0.05, margin: float = 1.0,
                 subj_col: str = "subj_id", pred_col: str = "pred",
                 obj_col: str = "obj_id",
                 num_partitions: int | None = None):
    """Returns (per-epoch loss DataFrame, entity_embeddings dict,
    relation_embeddings dict). Loss is the corpus-mean margin-ranking
    loss BEFORE each epoch's update (so a decreasing column certifies
    learning)."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.util import md5_hash64

    edges = edges_ds.materialize()

    # vocabularies (combiner-reduced, vocabulary-bounded)
    ents = grouped_aggregate(
        edges.map_batches(
            lambda df: pd.DataFrame({"e": np.concatenate(
                [df[subj_col].to_numpy(np.int64),
                 df[obj_col].to_numpy(np.int64)])})
            if subj_col in df.columns else
            pd.DataFrame({"e": pd.Series(dtype="int64")}),
            batch_format="pandas"),
        ["e"], {"n": (None, "count")},
        num_partitions=num_partitions).to_pandas()
    rels = grouped_aggregate(
        edges.map_batches(
            lambda df: pd.DataFrame({"r": df[pred_col]})
            if pred_col in df.columns else
            pd.DataFrame({"r": pd.Series(dtype="object")}),
            batch_format="pandas"),
        ["r"], {"n": (None, "count")},
        num_partitions=num_partitions).to_pandas()
    ent_ids = (np.sort(ents["e"].to_numpy(np.int64))
               if "e" in ents.columns else np.empty(0, np.int64))
    rel_ids = (sorted(str(r) for r in rels["r"])
               if "r" in rels.columns else [])
    if not len(ent_ids):
        return (pd.DataFrame({"epoch": pd.Series(dtype="int64"),
                              "loss": pd.Series(dtype="float64")}),
                {}, {})
    rel_pos = {r: i for i, r in enumerate(rel_ids)}
    E = np.stack([_seeded_vec(f"ent|{e}", dim) for e in ent_ids])
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    R = np.stack([_seeded_vec(f"rel|{r}", dim) for r in rel_ids])

    gcols = [f"g{i}" for i in range(dim)]
    losses = []
    for epoch in range(epochs):
        ref = ray.put((E, R, ent_ids, rel_pos, epoch))

        def grads(df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {"kind": pd.Series(dtype="object"),
                 "idx": pd.Series(dtype="int64"),
                 "loss": pd.Series(dtype="float64"),
                 "n": pd.Series(dtype="int64"),
                 **{c: pd.Series(dtype="float64") for c in gcols}})
            if df.empty or subj_col not in df.columns:
                return empty
            Eb, Rb, eids, rpos, ep = ray.get(ref)
            # eids is sorted ⇒ position lookup is one searchsorted
            h = np.searchsorted(eids, df[subj_col].to_numpy(np.int64))
            t = np.searchsorted(eids, df[obj_col].to_numpy(np.int64))
            r = df[pred_col].astype(str).map(rpos).to_numpy(np.int64)
            # md5-deterministic corrupted tails (one digest per edge —
            # edges are distinct so unique-then-scatter buys nothing)
            sv = df[subj_col].to_numpy()
            pv = df[pred_col].to_numpy()
            ov = df[obj_col].to_numpy()
            hneg = np.fromiter(
                (md5_hash64(f"{s}|{p}|{o}|{ep}")
                 for s, p, o in zip(sv, pv, ov)),
                dtype=np.uint64, count=len(df))
            tn = (hneg % np.uint64(len(eids))).astype(np.int64)
            dp_vec = Eb[h] + Rb[r] - Eb[t]
            dn_vec = Eb[h] + Rb[r] - Eb[tn]
            dp = np.sqrt((dp_vec * dp_vec).sum(axis=1))
            dn = np.sqrt((dn_vec * dn_vec).sum(axis=1))
            viol = margin + dp - dn
            act = viol > 0
            loss = float(np.maximum(viol, 0.0).sum())
            if not act.any():
                out = empty
                out.loc[0] = ["loss", 0, loss, len(df)] + [0.0] * dim
                return out
            # subgradients (unit-safe: guard zero distances)
            gp = dp_vec[act] / np.maximum(dp[act, None], 1e-12)
            gn = dn_vec[act] / np.maximum(dn[act, None], 1e-12)
            # vectorized row assembly: per active triple the four
            # subgradient rows are head(+gp-gn), tail(-gp), neg
            # tail(+gn) on the entity side and the predicate(+gp-gn)
            idx = np.concatenate([h[act], t[act], tn[act], r[act]])
            G = np.concatenate([gp - gn, -gp, gn, gp - gn], axis=0)
            na = int(act.sum())
            kinds = np.concatenate([np.repeat("e", 3 * na),
                                    np.repeat("r", na)])
            part = pd.DataFrame({"kind": kinds, "idx": idx,
                                 "loss": 0.0, "n": 0})
            for ci, c in enumerate(gcols):
                part[c] = G[:, ci]
            part = part.groupby(["kind", "idx"], sort=False,
                                as_index=False).sum()
            lrow = pd.DataFrame(
                {"kind": ["loss"], "idx": [0], "loss": [loss],
                 "n": [len(df)],
                 **{c: [0.0] for c in gcols}})
            return pd.concat([part, lrow], ignore_index=True)

        agg = grouped_aggregate(
            edges.map_batches(grads, batch_format="pandas"),
            ["kind", "idx"],
            {"loss": ("loss", "sum"), "n": ("n", "sum"),
             **{c: (c, "sum") for c in gcols}},
            num_partitions=num_partitions).to_pandas()
        lrow = agg[agg["kind"] == "loss"]
        total_n = int(lrow["n"].sum())
        losses.append((epoch,
                       float(lrow["loss"].sum()) / max(total_n, 1)))
        eg = agg[agg["kind"] == "e"]
        rg = agg[agg["kind"] == "r"]
        if len(eg):
            Gm = eg[gcols].to_numpy(np.float64)
            E[eg["idx"].to_numpy(np.int64)] -= lr * Gm
        if len(rg):
            Gm = rg[gcols].to_numpy(np.float64)
            R[rg["idx"].to_numpy(np.int64)] -= lr * Gm
        E /= np.linalg.norm(E, axis=1, keepdims=True)

    loss_df = pd.DataFrame(losses, columns=["epoch", "loss"])
    loss_df["epoch"] = loss_df["epoch"].astype("int64")
    ent_emb = {int(e): E[i].copy() for i, e in enumerate(ent_ids)}
    rel_emb = {r: R[i].copy() for i, r in enumerate(rel_ids)}
    return loss_df, ent_emb, rel_emb


def transe_link_prediction(edges_ds, ent_emb: dict, rel_emb: dict, *,
                           subj_col: str = "subj_id",
                           pred_col: str = "pred",
                           obj_col: str = "obj_id") -> pd.DataFrame:
    """Tail-prediction ranking eval (the paper's protocol, raw
    setting): for each (h, r, t) edge, the rank of the true tail t
    among ALL entities by ||E_h + R_r − E_e||, optimistic ties
    (rank = 1 + #strictly-closer, so the sum is integer-exact and
    deterministic regardless of block order). One streaming pass;
    the (vocab × d) matrices broadcast once — the same
    vocabulary-bounded contract as PageRank/HITS. Distance compare
    uses squared distances from ONE Gram-trick matrix per batch
    (d² = |a|² + |e|² − 2a·e) with the true-tail column read out of
    that same matrix, so the comparison is bit-consistent.

    Returns one row: n_edges, n_entities, mean_rank, hits_at_1,
    hits_at_10 (rates), sum_rank (the integer invariant).
    """
    import ray

    eids = np.sort(np.fromiter(ent_emb.keys(), dtype=np.int64,
                               count=len(ent_emb)))
    E = np.stack([ent_emb[int(e)] for e in eids]) if len(eids) else \
        np.empty((0, 1))
    rel_pos = {r: i for i, r in enumerate(sorted(rel_emb))}
    R = np.stack([rel_emb[r] for r in sorted(rel_emb)]) if rel_emb \
        else np.empty((0, 1))
    if not len(eids):
        return pd.DataFrame([{"n_edges": 0, "n_entities": 0,
                              "mean_rank": 0.0, "hits_at_1": 0.0,
                              "hits_at_10": 0.0, "sum_rank": 0}])
    e2 = (E * E).sum(axis=1)
    ref = ray.put((eids, E, e2, rel_pos, R))

    def rank_part(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or subj_col not in df.columns:
            return pd.DataFrame({"sum_rank": pd.Series(dtype="int64"),
                                 "h1": pd.Series(dtype="int64"),
                                 "h10": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        eids_b, Eb, e2_b, rpos, Rb = ray.get(ref)
        h = np.searchsorted(eids_b, df[subj_col].to_numpy(np.int64))
        t = np.searchsorted(eids_b, df[obj_col].to_numpy(np.int64))
        r = df[pred_col].astype(str).map(rpos).to_numpy(np.int64)
        A = Eb[h] + Rb[r]                       # (b, d) queries
        D2 = (A * A).sum(axis=1)[:, None] + e2_b[None, :] \
            - 2.0 * (A @ Eb.T)                  # (b, vocab)
        dt2 = D2[np.arange(len(df)), t]
        rank = 1 + (D2 < dt2[:, None]).sum(axis=1)
        return pd.DataFrame([{"sum_rank": int(rank.sum()),
                              "h1": int((rank <= 1).sum()),
                              "h10": int((rank <= 10).sum()),
                              "n": len(df)}])

    parts = edges_ds.map_batches(rank_part,
                                 batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    sum_rank = int(parts["sum_rank"].sum())
    return pd.DataFrame([{
        "n_edges": n, "n_entities": int(len(eids)),
        "mean_rank": sum_rank / max(n, 1),
        "hits_at_1": int(parts["h1"].sum()) / max(n, 1),
        "hits_at_10": int(parts["h10"].sum()) / max(n, 1),
        "sum_rank": sum_rank}])
