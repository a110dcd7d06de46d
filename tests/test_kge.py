"""TransE KGE tests: serial-recompute parity of the distributed
gradient pass, brute-force link-prediction rank parity, and the
planted-structure learning gain."""

import numpy as np
import pandas as pd
import ray.data as rd

from jerex_ray.ops.kge import (_seeded_vec, transe_link_prediction,
                               transe_train)
from jerex_ray.util import md5_hash64


def _edge_ds(edges):
    return rd.from_pandas(pd.DataFrame(
        {"subj_id": [s for s, _, _ in edges],
         "pred": [p for _, p, _ in edges],
         "obj_id": [o for _, _, o in edges]}))


def _serial_transe(edges, dim, epochs, lr=0.05, margin=1.0):
    """In-memory reference: identical init, negatives, subgradients
    and update order as ``transe_train`` — full-batch accumulation."""
    ents = np.array(sorted({e for s, _, o in edges for e in (s, o)}),
                    dtype=np.int64)
    rels = sorted({p for _, p, _ in edges})
    epos = {int(e): i for i, e in enumerate(ents)}
    rpos = {r: i for i, r in enumerate(rels)}
    E = np.stack([_seeded_vec(f"ent|{e}", dim) for e in ents])
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    R = np.stack([_seeded_vec(f"rel|{r}", dim) for r in rels])
    losses = []
    for ep in range(epochs):
        Ge = np.zeros_like(E)
        Gr = np.zeros_like(R)
        tot = 0.0
        for s, p, o in edges:
            h, t, r = epos[s], epos[o], rpos[p]
            tn = md5_hash64(f"{s}|{p}|{o}|{ep}") % len(ents)
            dpv = E[h] + R[r] - E[t]
            dnv = E[h] + R[r] - E[tn]
            dp = float(np.sqrt((dpv * dpv).sum()))
            dn = float(np.sqrt((dnv * dnv).sum()))
            v = margin + dp - dn
            tot += max(v, 0.0)
            if v > 0:
                gp = dpv / max(dp, 1e-12)
                gn = dnv / max(dn, 1e-12)
                Ge[h] += gp - gn
                Ge[t] -= gp
                Ge[tn] += gn
                Gr[r] += gp - gn
        losses.append(tot / len(edges))
        E -= lr * Ge
        R -= lr * Gr
        E /= np.linalg.norm(E, axis=1, keepdims=True)
    return losses, ents, E, R


def _rand_edges(n_ent=14, n_edges=60, seed=3):
    rng = np.random.default_rng(seed)
    seen = set()
    for _ in range(n_edges * 3):
        s, o = rng.integers(0, n_ent, 2)
        if s == o:
            continue
        p = ["likes", "made", "at"][int(rng.integers(0, 3))]
        seen.add((int(s) + 100, p, int(o) + 100))
        if len(seen) >= n_edges:
            break
    return sorted(seen)


def test_transe_serial_parity():
    edges = _rand_edges()
    loss_df, ent_emb, rel_emb = transe_train(
        _edge_ds(edges), dim=8, epochs=3)
    losses, ents, E, R = _serial_transe(edges, dim=8, epochs=3)
    assert np.allclose(loss_df["loss"].to_numpy(), losses, rtol=1e-9)
    got = np.stack([ent_emb[int(e)] for e in ents])
    assert np.allclose(got, E, rtol=1e-8, atol=1e-10)
    assert np.allclose(
        np.stack([rel_emb[r] for r in sorted(rel_emb)]), R,
        rtol=1e-8, atol=1e-10)


def test_linkpred_rank_brute_force():
    edges = _rand_edges(seed=11)
    _, ent_emb, rel_emb = transe_train(_edge_ds(edges), dim=8, epochs=2)
    lp = transe_link_prediction(_edge_ds(edges), ent_emb, rel_emb)
    eids = sorted(ent_emb)
    sum_rank = h1 = h10 = 0
    for s, p, o in edges:
        a = ent_emb[s] + rel_emb[p]
        dt = ((a - ent_emb[o]) ** 2).sum()
        rank = 1 + sum(((a - ent_emb[e]) ** 2).sum() < dt
                       for e in eids)
        sum_rank += rank
        h1 += rank <= 1
        h10 += rank <= 10
    assert int(lp["sum_rank"].iloc[0]) == sum_rank
    assert lp["hits_at_1"].iloc[0] == h1 / len(edges)
    assert lp["hits_at_10"].iloc[0] == h10 / len(edges)
    assert lp["n_edges"].iloc[0] == len(edges)


def test_transe_learns_planted_structure():
    # ring graph: i -likes-> i+1 — dense enough that margin-ranking
    # SGD must beat the untrained init on train-set mean rank
    edges = [(i + 100, "likes", (i + 1) % 24 + 100) for i in range(24)]
    ds = _edge_ds(edges)
    _, emb0, rel0 = transe_train(ds, dim=8, epochs=0)
    loss_df, emb, rel = transe_train(ds, dim=8, epochs=12, lr=0.1)
    assert loss_df["loss"].iloc[-1] < loss_df["loss"].iloc[0]
    lp0 = transe_link_prediction(ds, emb0, rel0)
    lp1 = transe_link_prediction(ds, emb, rel)
    assert int(lp1["sum_rank"].iloc[0]) < int(lp0["sum_rank"].iloc[0])


def test_transe_empty_edges():
    ds = rd.from_pandas(pd.DataFrame(
        {"subj_id": pd.Series(dtype="int64"),
         "pred": pd.Series(dtype="object"),
         "obj_id": pd.Series(dtype="int64")}))
    loss_df, ent_emb, rel_emb = transe_train(ds, dim=4, epochs=2)
    assert loss_df.empty and not ent_emb and not rel_emb
    lp = transe_link_prediction(ds, ent_emb, rel_emb)
    assert int(lp["n_edges"].iloc[0]) == 0
