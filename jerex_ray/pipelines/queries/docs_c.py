"""Split of the query registry: ``docs_c`` part (mechanically derived from the original queries.py by scripts/split_queries.py; unit order and source text preserved)."""

from __future__ import annotations
import re
import numpy as np
import pandas as pd
from jerex_ray.config import PipelineConfig
from jerex_ray.runtime import configure_data_context
from jerex_ray.pipelines.queries._shared import ORACLE_REGISTRY
from jerex_ray.pipelines.queries._shared import _N_TOKENS_SQL, _round_half_away  # noqa: E501

def doc_source_logodds(sf_dir: str, *, alpha: float = 0.01,
                       top: int = 10):
    """Log-odds-ratio with informative Dirichlet prior (Monroe et
    al. '08, "Fightin' Words") between the two largest sources (doc
    count DESC, name ASC): the per-word "which words distinguish
    source A from B" ranking that the distribution-level KL/Jaccard
    source audits can't give. δ_w = ln((y1+α)/(n1+αV−y1−α)) −
    ln((y2+α)/(n2+αV−y2−α)), z = δ/√(1/(y1+α)+1/(y2+α)); counts
    are exact integers from ONE (source, word) combiner pass, and
    the ranking cut (|z| DESC, word ASC) is decided by the
    identical glibc-ln double on both engines (the t-closeness
    convention). Returns the top-``top`` discriminating words."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "source", "text"])

    ndocs = grouped_aggregate(
        ds.map_batches(lambda df: df[["source", "doc_id"]]
                       .drop_duplicates(), batch_format="pandas"),
        ["source"], {"n": (None, "count")}).to_pandas()
    ndocs = ndocs.sort_values(["n", "source"],
                              ascending=[False, True])
    sa, sb = str(ndocs["source"].iloc[0]), \
        str(ndocs["source"].iloc[1])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[batch["source"].isin([sa, sb])]
        words = m["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        src = np.repeat(m["source"].to_numpy(), lens)
        g = pd.DataFrame({"source": src, "w": flat}) \
            .groupby(["source", "w"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype("int64")
        return g

    wc = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas",
                       batch_size=4096),
        ["source", "w"], {"c": ("c", "sum")}).to_pandas()
    piv = wc.pivot_table(index="w", columns="source", values="c",
                         fill_value=0, aggfunc="sum")
    y1 = piv.get(sa, pd.Series(0, index=piv.index)) \
        .to_numpy(np.int64)
    y2 = piv.get(sb, pd.Series(0, index=piv.index)) \
        .to_numpy(np.int64)
    n1, n2 = int(y1.sum()), int(y2.sum())
    V = len(piv)
    A = alpha * V
    words = piv.index.to_numpy()
    rows = []
    for w, a_, b_ in zip(words, y1, y2):
        d = (math.log((a_ + alpha) / (n1 + A - a_ - alpha))
             - math.log((b_ + alpha) / (n2 + A - b_ - alpha)))
        z = d / math.sqrt(1.0 / (a_ + alpha) + 1.0 / (b_ + alpha))
        rows.append((str(w), int(a_), int(b_), z))
    rows.sort(key=lambda r: (-abs(r[3]), r[0]))
    out = pd.DataFrame(rows[:top],
                       columns=["word", "y1", "y2", "z"])
    out["source_a"], out["source_b"] = sa, sb
    out["z"] = [_round_half_away(z, 6) for z in out["z"]]
    out = out.astype({"y1": "int64", "y2": "int64"})
    return out[["source_a", "source_b", "word", "y1", "y2", "z"]] \
        .sort_values("word").reset_index(drop=True)

def _logodds_oracle_sql(alpha: float = 0.01, top: int = 10) -> str:
    return f"""
        WITH top2 AS MATERIALIZED (
            SELECT source, row_number() OVER (
                ORDER BY count(DISTINCT doc_id) DESC, source ASC)
                AS rk
            FROM documents GROUP BY source QUALIFY rk <= 2),
        w AS MATERIALIZED (
            SELECT t.rk, unnest(list_filter(
                regexp_split_to_array(lower(coalesce(text, '')),
                                      '\\s+'), x -> x <> '')) AS w
            FROM documents d JOIN top2 t ON t.source = d.source),
        c AS MATERIALIZED (
            SELECT w,
                   CAST(count(*) FILTER (WHERE rk = 1) AS BIGINT)
                       AS y1,
                   CAST(count(*) FILTER (WHERE rk = 2) AS BIGINT)
                       AS y2
            FROM w GROUP BY w),
        tot AS (SELECT sum(y1) AS n1, sum(y2) AS n2,
                       count(*) * {alpha} AS aa FROM c),
        z AS MATERIALIZED (
            SELECT c.w, c.y1, c.y2,
                   (ln((c.y1 + {alpha})
                       / (tot.n1 + tot.aa - c.y1 - {alpha}))
                    - ln((c.y2 + {alpha})
                         / (tot.n2 + tot.aa - c.y2 - {alpha})))
                   / sqrt(1.0 / (c.y1 + {alpha})
                          + 1.0 / (c.y2 + {alpha})) AS z
            FROM c CROSS JOIN tot),
        rk AS (SELECT *, row_number() OVER (
                   ORDER BY abs(z) DESC, w ASC) AS rn FROM z)
        SELECT (SELECT source FROM top2 WHERE rk = 1) AS source_a,
               (SELECT source FROM top2 WHERE rk = 2) AS source_b,
               w AS word, y1, y2, round(z, 6) AS z
        FROM rk WHERE rn <= {top} ORDER BY word"""

def doc_multi_pattern(sf_dir: str, *, top: int = 20,
                      min_len: int = 4):
    """One-pass multi-pattern gazetteer scan (Aho–Corasick '75,
    ``ops/match.py``) of the corpus against its own top-``top``
    frequent words of length ≥ ``min_len`` (count DESC, word ASC —
    a deterministic stand-in for the PII/entity lexicon a curation
    pipeline sweeps at 100 TB): per (doc, pattern) the OVERLAPPING
    substring occurrence count, i.e. hits at every position — the
    semantics a positions × patterns SQL lateral replays exactly
    (regex/replace counting is non-overlapping and would not).
    The automaton builds ONCE PER ACTOR in ``__init__`` and every
    batch streams through it — the stateful actor-pool contract."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.match import run_multi_pattern_counts
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"]) \
        .materialize()

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        flat = [w for ws in words.to_numpy() if isinstance(ws, list)
                for w in ws if len(w) >= min_len]
        if not flat:
            return pd.DataFrame({"w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        u, c = np.unique(np.array(flat, dtype=object),
                         return_counts=True)
        return pd.DataFrame({"w": u, "c": c.astype(np.int64)})

    wc = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas",
                       batch_size=4096),
        ["w"], {"c": ("c", "sum")}).to_pandas()
    wc = wc.sort_values(["c", "w"], ascending=[False, True])
    patterns = [str(w) for w in wc["w"].head(top)]

    out = run_multi_pattern_counts(ds, patterns).to_pandas()
    if out.empty or "doc_id" not in out.columns:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "pattern": pd.Series(dtype="object"),
                             "n_matches": pd.Series(dtype="int64")})
    return out.sort_values(["doc_id", "pattern"]) \
        .reset_index(drop=True)

def _multi_pattern_oracle_sql(top: int = 20,
                              min_len: int = 4) -> str:
    return f"""
        WITH w AS (
            SELECT unnest(list_filter(
                regexp_split_to_array(lower(coalesce(text, '')),
                                      '\\s+'),
                x -> length(x) >= {min_len})) AS w
            FROM documents),
        pat AS MATERIALIZED (
            SELECT w AS p, row_number() OVER (
                ORDER BY count(*) DESC, w ASC) AS rk
            FROM w GROUP BY w QUALIFY rk <= {top}),
        d AS MATERIALIZED (
            SELECT doc_id, lower(coalesce(text, '')) AS t
            FROM documents),
        hits AS (
            SELECT d.doc_id, pat.p AS pattern,
                   count(*) AS n_matches
            FROM d CROSS JOIN pat,
                 LATERAL (SELECT unnest(range(1,
                     greatest(length(d.t) - length(pat.p) + 1, 0)
                     + 1)) AS i) pos
            WHERE substr(d.t, pos.i, length(pat.p)) = pat.p
            GROUP BY d.doc_id, pat.p)
        SELECT doc_id, pattern,
               CAST(n_matches AS BIGINT) AS n_matches
        FROM hits ORDER BY doc_id, pattern"""

def doc_string_complexity(sf_dir: str):
    """Stringology complexity audit of the LONGEST document
    (n_chars DESC, doc_id ASC): distinct-substring count via a
    suffix automaton (Blumer et al. '85 — Σ len(v) − len(link(v))
    over states, built online in O(n)) and the equal-letter run
    count of the Burrows–Wheeler transform (Burrows & Wheeler '94 —
    the r that r-index compressed structures scale with; low r =
    highly repetitive text). Both are EXACT integers the oracle
    recomputes from first principles: all-substrings DISTINCT count,
    and the BWT via sorted rotations of the doubled string with a
    LAG run count (equal rotations share last chars, so tie order
    cannot change runs).

    Scale shape: the doc pick is an exact per-block top-k; the O(n)
    automaton and the rotation sort run driver-side on the single
    selected payload."""
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n": t.str.len().astype(np.int64),
            "text": t})

    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort").head(1)

    top = ds.map_batches(stats, batch_format="pandas",
                         batch_size=8192) \
        .map_batches(block_top, batch_format="pandas").to_pandas()
    top = top.sort_values(["n", "doc_id"],
                          ascending=[False, True],
                          kind="mergesort").head(1)
    did = int(top["doc_id"].iloc[0])
    t = str(top["text"].iloc[0]).lower()
    n = len(t)

    # suffix automaton (online construction)
    sa_len = [0]
    sa_link = [-1]
    sa_next: list[dict] = [{}]
    last = 0
    for ch in t:
        cur = len(sa_len)
        sa_len.append(sa_len[last] + 1)
        sa_link.append(-1)
        sa_next.append({})
        p = last
        while p != -1 and ch not in sa_next[p]:
            sa_next[p][ch] = cur
            p = sa_link[p]
        if p == -1:
            sa_link[cur] = 0
        else:
            q = sa_next[p][ch]
            if sa_len[p] + 1 == sa_len[q]:
                sa_link[cur] = q
            else:
                clone = len(sa_len)
                sa_len.append(sa_len[p] + 1)
                sa_link.append(sa_link[q])
                sa_next.append(dict(sa_next[q]))
                while p != -1 and sa_next[p].get(ch) == q:
                    sa_next[p][ch] = clone
                    p = sa_link[p]
                sa_link[q] = clone
                sa_link[cur] = clone
        last = cur
    distinct = sum(sa_len[v] - sa_len[sa_link[v]]
                   for v in range(1, len(sa_len)))

    # BWT run count via sorted rotations of the doubled string
    dd = t + t
    rot = sorted(range(n), key=lambda i: dd[i:i + n])
    bwt = "".join(t[(i - 1) % n] for i in rot)
    runs = 1 + sum(1 for a, b in zip(bwt, bwt[1:]) if a != b) \
        if n else 0
    return pd.DataFrame({
        "doc_id": np.array([did], dtype=np.int64),
        "n_chars": np.array([n], dtype=np.int64),
        "distinct_substrings": np.array([distinct], dtype=np.int64),
        "bwt_runs": np.array([runs], dtype=np.int64)})

_STRING_COMPLEXITY_ORACLE_SQL = """
    WITH d AS MATERIALIZED (
        SELECT doc_id, lower(coalesce(text, '')) AS t,
               length(coalesce(text, '')) AS n,
               row_number() OVER (
                   ORDER BY length(coalesce(text, '')) DESC,
                            doc_id ASC) AS rk
        FROM documents QUALIFY rk = 1),
    subs AS (
        SELECT count(DISTINCT substr(d.t, p.i, p2.l)) AS ds
        FROM d, LATERAL (SELECT unnest(range(1, d.n + 1)) AS i) p,
             LATERAL (SELECT unnest(range(1, d.n - p.i + 2))
                      AS l) p2),
    rot AS MATERIALIZED (
        SELECT substr(d.t || d.t, p.i, d.n) AS r,
               substr(d.t, CASE WHEN p.i = 1 THEN d.n
                                ELSE p.i - 1 END, 1) AS last_ch
        FROM d, LATERAL (SELECT unnest(range(1, d.n + 1)) AS i) p),
    bwt AS (SELECT last_ch, lag(last_ch) OVER (ORDER BY r)
                       AS prev
            FROM rot),
    runs AS (SELECT 1 + count(*) FILTER (
                 WHERE prev IS NOT NULL AND last_ch <> prev)
                 AS runs
             FROM bwt)
    SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_chars,
           CAST(subs.ds AS BIGINT) AS distinct_substrings,
           CAST(runs.runs AS BIGINT) AS bwt_runs
    FROM d CROSS JOIN subs CROSS JOIN runs"""

_PERCEPTRON_MARKERS = ("sort", "merge", "the")

def doc_perceptron(sf_dir: str, *, sample_max_id: int = 128):
    """Rosenblatt perceptron ('58) — the online mistake-driven
    member of the ML family (beside batch logreg / Naive Bayes /
    stumps / AdaBoost) — trained on the topic-dominance concept
    y = +1 iff count('sort') > count('merge'): linearly separable
    with margin 1 by construction (w* = (1,−1,0,0)), so Novikoff's
    convergence theorem actually bites and the corpus is a genuine
    testbed for exact online-learning replay (the synthetic corpus
    carries no organic label signal — measured, not assumed). The
    'the' count rides along as a nuisance feature the learner must
    zero out. EXACT end-to-end: integer marker-word counts under
    the shared ``[a-zà-ÿ]+`` lowered tokenization plus a bias,
    updates w ← w + y·x on mistakes (prediction sign(w·x), score>0
    convention), so every weight, the mistake count, and the corpus
    accuracy census are exact integers — the recursive-CTE oracle
    replays the whole training sequence step by step with zero
    float anywhere.

    Scale shape: train-small / evaluate-everywhere. The inherently
    sequential training runs driver-side over the metadata-sized
    ``doc_id < sample_max_id`` sample (one filtered feature pass);
    the trained weights then broadcast into ONE corpus-wide combiner
    pass of per-block (correct, total) integer partials. Output:
    one row (final weights, training mistakes, corpus accuracy
    census)."""
    import re as _re

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    word_re = _re.compile(r"[a-zà-ÿ]+")
    markers = _PERCEPTRON_MARKERS

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id": pd.Series(dtype="int64"),
                "y": pd.Series(dtype="int64"),
                **{f"x{j + 1}": pd.Series(dtype="int64")
                   for j in range(len(markers))}}
        if df.empty:
            return pd.DataFrame(cols)
        n = len(df)
        wl = df["text"].fillna("").str.lower().str.findall(word_re)
        lens = wl.str.len().to_numpy()
        out = {"doc_id": df["doc_id"].to_numpy(np.int64)}
        if lens.sum() == 0:
            for j in range(len(markers)):
                out[f"x{j + 1}"] = np.zeros(n, dtype=np.int64)
        else:
            doc_idx = np.repeat(np.arange(n), lens)
            flat = np.concatenate([np.asarray(x, dtype=object)
                                   for x in wl])
            for j, w in enumerate(markers):
                out[f"x{j + 1}"] = np.bincount(
                    doc_idx[flat == w],
                    minlength=n).astype(np.int64)
        out["y"] = np.where(out["x1"] > out["x2"], 1, -1) \
            .astype(np.int64)
        return pd.DataFrame(out)

    fds = ds.map_batches(feats, batch_format="pandas").materialize()
    sample = fds.map_batches(
        lambda df: df[df["doc_id"] < sample_max_id]
        if "doc_id" in df.columns else df,
        batch_format="pandas").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    d = len(markers) + 1
    w = [0] * d
    mistakes = 0
    for r in sample.itertuples():
        x = [int(getattr(r, f"x{j + 1}"))
             for j in range(len(markers))] + [1]
        score = sum(w[j] * x[j] for j in range(d))
        pred = 1 if score > 0 else -1
        if pred != int(r.y):
            for j in range(d):
                w[j] += int(r.y) * x[j]
            mistakes += 1
    import ray
    wref = ray.put(list(w))

    def eval_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "y" not in df.columns:
            return pd.DataFrame({"g": pd.Series(dtype="int64"),
                                 "ok": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        wv = ray.get(wref)
        score = np.zeros(len(df), dtype=np.int64)
        for j in range(len(markers)):
            score += wv[j] * df[f"x{j + 1}"].to_numpy(np.int64)
        score += wv[-1]
        pred = np.where(score > 0, 1, -1)
        ok = int((pred == df["y"].to_numpy(np.int64)).sum())
        return pd.DataFrame({"g": [0], "ok": [ok],
                             "n": [len(df)]})

    ev = grouped_aggregate(
        fds.map_batches(eval_partial, batch_format="pandas"),
        ["g"], {"ok": ("ok", "sum"), "n": ("n", "sum")},
        result_hint="small").to_pandas()
    cols = {f"w_{m}": np.array([w[j]], dtype=np.int64)
            for j, m in enumerate(markers)}
    cols["w_bias"] = np.array([w[-1]], dtype=np.int64)
    cols["mistakes"] = np.array([mistakes], dtype=np.int64)
    cols["n_correct"] = np.array([int(ev["ok"].iloc[0])],
                                 dtype=np.int64)
    cols["n_total"] = np.array([int(ev["n"].iloc[0])],
                               dtype=np.int64)
    return pd.DataFrame(cols)

def _perceptron_oracle_sql(sample_max_id: int = 128) -> str:
    """Recursive-CTE replay of ``doc_perceptron``: one feature CTE,
    the step-by-step integer weight recursion over the ordered
    sample, and the corpus accuracy census under the final w."""
    m = _PERCEPTRON_MARKERS
    d = len(m) + 1
    fx = ",\n                   ".join(
        f"len(list_filter(regexp_extract_all(lower(text), "
        f"'[a-zà-ÿ]+'), x -> x = '{w}')) AS x{j + 1}"
        for j, w in enumerate(m))
    score = " + ".join(f"r.w{j + 1} * s.x{j + 1}"
                       for j in range(len(m))) + f" + r.w{d}"
    upd = ", ".join(
        f"CASE WHEN (CASE WHEN {score} > 0 THEN 1 ELSE -1 END) "
        f"<> s.y THEN r.w{j + 1} + s.y * s.x{j + 1} "
        f"ELSE r.w{j + 1} END"
        for j in range(len(m)))
    updb = (f"CASE WHEN (CASE WHEN {score} > 0 THEN 1 ELSE -1 END) "
            f"<> s.y THEN r.w{d} + s.y ELSE r.w{d} END")
    updm = (f"CASE WHEN (CASE WHEN {score} > 0 THEN 1 ELSE -1 END) "
            f"<> s.y THEN r.mistakes + 1 ELSE r.mistakes END")
    fscore = " + ".join(f"fin.w{j + 1} * f.x{j + 1}"
                        for j in range(len(m))) + f" + fin.w{d}"
    zeros = ", ".join(f"CAST(0 AS BIGINT) AS w{j + 1}"
                      for j in range(d))
    wsel = ", ".join(f"w{j + 1}" for j in range(d))
    wout = ", ".join(f"fin.w{j + 1} AS w_{w}"
                     for j, w in enumerate(m))
    return f"""
        WITH RECURSIVE f0 AS MATERIALIZED (
            SELECT doc_id, {fx}
            FROM documents),
        f AS MATERIALIZED (
            SELECT *, CASE WHEN x1 > x2 THEN 1 ELSE -1 END AS y
            FROM f0),
        s AS MATERIALIZED (
            SELECT *, row_number() OVER (ORDER BY doc_id) AS rn
            FROM f WHERE doc_id < {sample_max_id}),
        rec AS (
            SELECT 0 AS step, {zeros},
                   CAST(0 AS BIGINT) AS mistakes
            UNION ALL
            SELECT r.step + 1, {upd}, {updb}, {updm}
            FROM rec r JOIN s ON s.rn = r.step + 1),
        fin AS (SELECT {wsel}, mistakes FROM rec
                ORDER BY step DESC LIMIT 1)
        SELECT {wout}, fin.w{d} AS w_bias, fin.mistakes,
               (SELECT count(*) FILTER (WHERE
                    (CASE WHEN {fscore} > 0 THEN 1 ELSE -1 END)
                    = f.y)
                FROM f, fin) AS n_correct,
               (SELECT count(*) FROM f) AS n_total
        FROM fin"""

def doc_bleu_pair(sf_dir: str):
    """BLEU-4 (Papineni et al. '02) of the second-longest document
    against the longest (n_tokens DESC, doc_id ASC — the
    knapsack/NW pick): the machine-translation metric repurposed as
    the self-similarity audit beside the token-level NW alignment —
    high cross-document BLEU flags template boilerplate a
    near-dedup pass should fold. Exactness: the four clipped
    modified-precision numerators m_n = Σ_g min(cnt_cand, cnt_ref)
    and denominators c_n = len_cand − n + 1 are EXACT INTEGERS; the
    brevity penalty exp(1 − r/c) and the geometric mean
    exp((ln p₁ + ln p₂ + ln p₃ + ln p₄)/4) are ONE identical
    fixed-order float expression (round 6), with the BLEU = 0 rule
    when any m_n = 0 decided by integer comparison on both engines.

    Scale shape: the pair pick is an exact per-block top-k; the
    n-gram clip census runs driver-side on the two-document
    payload."""
    import math
    from collections import Counter

    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n": toks.str.len().fillna(0).astype(np.int64),
            "text": df["text"].fillna("")})

    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort").head(2)

    top = ds.map_batches(stats, batch_format="pandas",
                         batch_size=8192) \
        .map_batches(block_top, batch_format="pandas").to_pandas() \
        .sort_values(["n", "doc_id"], ascending=[False, True],
                     kind="mergesort").head(2).reset_index(drop=True)
    ref = [t.lower() for t in top["text"].iloc[0].split()]
    cand = [t.lower() for t in top["text"].iloc[1].split()]
    r, c = len(ref), len(cand)
    ms, cs = [], []
    for n in range(1, 5):
        cc = Counter(tuple(cand[i:i + n]) for i in range(c - n + 1))
        cr = Counter(tuple(ref[i:i + n]) for i in range(r - n + 1))
        ms.append(int(sum(min(v, cr[g]) for g, v in cc.items())))
        cs.append(max(c - n + 1, 0))
    if any(m == 0 for m in ms) or any(x == 0 for x in cs):
        bleu = 0.0
    else:
        bp = math.exp(1.0 - r / c) if c < r else 1.0
        bleu = bp * math.exp(
            (math.log(ms[0] / cs[0]) + math.log(ms[1] / cs[1])
             + math.log(ms[2] / cs[2])
             + math.log(ms[3] / cs[3])) / 4.0)
    return pd.DataFrame({
        "doc_ref": np.array([int(top["doc_id"].iloc[0])],
                            dtype=np.int64),
        "doc_cand": np.array([int(top["doc_id"].iloc[1])],
                             dtype=np.int64),
        "len_ref": np.array([r], dtype=np.int64),
        "len_cand": np.array([c], dtype=np.int64),
        "m1": np.array([ms[0]], dtype=np.int64),
        "m2": np.array([ms[1]], dtype=np.int64),
        "m3": np.array([ms[2]], dtype=np.int64),
        "m4": np.array([ms[3]], dtype=np.int64),
        "bleu": [_round_half_away(bleu, 6)]})

def _bleu_pair_oracle_sql() -> str:
    grams = "\n".join(f"""
    g{n} AS MATERIALIZED (
        SELECT t.rk, array_to_string(t.ts[p.i:p.i + {n - 1}], ' ')
                   AS g, count(*) AS cnt
        FROM toks t, LATERAL (SELECT unnest(range(1,
            array_length(t.ts) - {n - 1} + 1)) AS i) p
        GROUP BY 1, 2),
    m{n} AS (SELECT coalesce(sum(least(c.cnt, r.cnt)), 0) AS m
             FROM g{n} c JOIN g{n} r
               ON r.rk = 1 AND c.rk = 2 AND r.g = c.g),"""
                     for n in range(1, 5))
    pn = " + ".join(
        f"ln((SELECT m FROM m{n}) / (lc - {n - 1} * 1.0))"
        for n in range(1, 5))
    zero = " OR ".join(f"(SELECT m FROM m{n}) = 0"
                       for n in range(1, 5))
    return f"""
    WITH it AS MATERIALIZED (
        SELECT doc_id, lower(coalesce(text, '')) AS t,
               row_number() OVER (
                   ORDER BY {_N_TOKENS_SQL} DESC, doc_id ASC) AS rk
        FROM documents QUALIFY rk <= 2),
    toks AS MATERIALIZED (
        SELECT rk, doc_id,
               list_filter(regexp_split_to_array(t, '\\s+'),
                           x -> x <> '') AS ts
        FROM it),
    {grams}
    lens AS (SELECT
        (SELECT array_length(ts) FROM toks WHERE rk = 1) AS lr,
        (SELECT array_length(ts) FROM toks WHERE rk = 2) AS lc)
    SELECT
        (SELECT doc_id FROM toks WHERE rk = 1) AS doc_ref,
        (SELECT doc_id FROM toks WHERE rk = 2) AS doc_cand,
        CAST(lr AS BIGINT) AS len_ref,
        CAST(lc AS BIGINT) AS len_cand,
        CAST((SELECT m FROM m1) AS BIGINT) AS m1,
        CAST((SELECT m FROM m2) AS BIGINT) AS m2,
        CAST((SELECT m FROM m3) AS BIGINT) AS m3,
        CAST((SELECT m FROM m4) AS BIGINT) AS m4,
        round(CASE WHEN {zero} THEN 0.0 ELSE
            (CASE WHEN lc < lr THEN exp(1.0 - lr / lc)
                  ELSE 1.0 END)
            * exp(({pn}) / 4.0) END, 6) AS bleu
    FROM lens"""

def doc_lz78(sf_dir: str):
    """LZ78 parse complexity (Lempel & Ziv '78) of the LONGEST
    document (n_chars DESC, doc_id ASC — the string-complexity
    pick): the incremental-dictionary phrase census completing the
    compressibility family beside the BWT run count, zlib ratio and
    content-defined chunking — few phrases = repetitive boilerplate
    (Lempel-Ziv complexity is the classic sequence-richness
    measure). Parse rule: grow the current phrase while it stays in
    the dictionary; on a miss, add it, count it, reset. The
    trailing in-dictionary remainder counts as one final phrase.
    Pure integer/string structure, bit-replayed by ONE recursive
    CTE stepping a (pos, cur, dict LIST, count) state one character
    at a time.

    Scale shape: exact per-block top-k pick; the O(n·phrases)
    driver walk touches the single selected payload."""
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n": t.str.len().astype(np.int64),
            "text": t})

    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort").head(1)

    top = ds.map_batches(stats, batch_format="pandas",
                         batch_size=8192) \
        .map_batches(block_top, batch_format="pandas").to_pandas() \
        .sort_values(["n", "doc_id"], ascending=[False, True],
                     kind="mergesort").head(1)
    did = int(top["doc_id"].iloc[0])
    t = str(top["text"].iloc[0]).lower()
    d: set[str] = set()
    cur = ""
    complete = 0
    for ch in t:
        cand = cur + ch
        if cand in d:
            cur = cand
        else:
            d.add(cand)
            complete += 1
            cur = ""
    n_phrases = complete + (1 if cur else 0)
    return pd.DataFrame({
        "doc_id": np.array([did], dtype=np.int64),
        "n_chars": np.array([len(t)], dtype=np.int64),
        "n_complete": np.array([complete], dtype=np.int64),
        "n_phrases": np.array([n_phrases], dtype=np.int64)})

_LZ78_ORACLE_SQL = """
    WITH RECURSIVE doc AS MATERIALIZED (
        SELECT doc_id, lower(coalesce(text, '')) AS t,
               length(lower(coalesce(text, ''))) AS n
        FROM documents
        ORDER BY length(coalesce(text, '')) DESC, doc_id ASC
        LIMIT 1),
    steps AS (
        SELECT 0 AS pos, '' AS cur, CAST([] AS VARCHAR[]) AS dict,
               0 AS cnt
        UNION ALL
        SELECT pos + 1,
               CASE WHEN list_contains(dict,
                        cur || substr(d.t, pos + 1, 1))
                    THEN cur || substr(d.t, pos + 1, 1)
                    ELSE '' END,
               CASE WHEN list_contains(dict,
                        cur || substr(d.t, pos + 1, 1))
                    THEN dict
                    ELSE list_append(dict,
                        cur || substr(d.t, pos + 1, 1)) END,
               CASE WHEN list_contains(dict,
                        cur || substr(d.t, pos + 1, 1))
                    THEN cnt ELSE cnt + 1 END
        FROM steps, doc d WHERE pos < d.n)
    SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_chars,
           CAST(s.cnt AS BIGINT) AS n_complete,
           CAST(s.cnt + CASE WHEN s.cur <> '' THEN 1 ELSE 0 END
                AS BIGINT) AS n_phrases
    FROM steps s, doc d WHERE s.pos = d.n"""

def doc_theil_inequality(sf_dir: str):
    """Theil T and Theil L (mean log deviation) inequality indices
    (Theil '67) of document length per source — the
    generalized-entropy companions of the per-source Gini
    concentration: T = Σ(x/μ)ln(x/μ)/n = Σx·ln x/S − ln(S/n) is
    top-sensitive, L = ln μ − Σln x/n is bottom-sensitive; both are
    exactly decomposable across subgroups (why economists use them
    for corpus-share audits). ONE combiner pass reduces each source
    to four scalars (n, S, Σx·ln x, Σln x); the closed forms are
    identical expressions on both engines with round-6 parity
    absorbing float summation order (the geomean convention —
    integer counts/sums stay exact)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["source", "n_chars"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_chars"] > 0]
        x = df["n_chars"].to_numpy(np.float64)
        lx = np.log(x)
        return pd.DataFrame({"source": df["source"].to_numpy(),
                             "n": np.int64(1),
                             "s": df["n_chars"].to_numpy(np.int64),
                             "xlx": x * lx, "lx": lx})

    m = grouped_aggregate(
        ds.map_batches(prep, batch_format="pandas"),
        ["source"],
        {"n": ("n", "sum"), "s": ("s", "sum"),
         "xlx": ("xlx", "sum"), "lx": ("lx", "sum")},
        result_hint="small").to_pandas()
    import math
    rows = []
    for r in m.itertuples():
        n, s = int(r.n), int(r.s)
        theil_t = r.xlx / s - math.log(s / (n * 1.0))
        theil_l = math.log(s / (n * 1.0)) - r.lx / n
        rows.append((r.source, n, s,
                     _round_half_away(theil_t, 6),
                     _round_half_away(theil_l, 6)))
    out = pd.DataFrame(rows, columns=["source", "n_docs",
                                      "total_chars", "theil_t",
                                      "theil_l"])
    return out.sort_values("source").reset_index(drop=True)

_THEIL_ORACLE_SQL = """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(sum(n_chars * ln(n_chars)) / sum(n_chars)
                 - ln(sum(n_chars) / (count(*) * 1.0)), 6)
               AS theil_t,
           round(ln(sum(n_chars) / (count(*) * 1.0))
                 - sum(ln(n_chars)) / count(*), 6) AS theil_l
    FROM documents WHERE n_chars > 0
    GROUP BY source ORDER BY source"""

_WINNOW_MARKERS = ("sort", "merge", "hash", "data", "the")

def doc_winnow(sf_dir: str, *, sample_max_id: int = 128,
               theta: float = 5.0):
    """Winnow2 online learner (Littlestone '88 — the multiplicative
    sibling of the Rosenblatt perceptron, with mistake bounds
    logarithmic in the number of irrelevant attributes) trained on
    the monotone-disjunction concept y = +1 iff 'sort' OR 'merge'
    present — exactly the concept class Winnow is built for; the
    'hash'/'data'/'the' presence bits ride along as nuisance
    attributes to be demoted away. Exactness: binary presence
    features, weights start at 1.0 and only ever double (promotion)
    or halve (demotion) — every weight is an exact dyadic float64
    and the score Σwᵢxᵢ (fixed left-assoc order, ≤5 small-exponent
    dyadics) is exactly representable, so prediction (score > θ),
    every update, the mistake count, and the corpus accuracy census
    replay bit-for-bit in the recursive-CTE oracle.

    Scale shape: train-small / evaluate-everywhere (the perceptron
    contract) — sequential training driver-side over the
    metadata-sized ``doc_id < sample_max_id`` sample, final weights
    broadcast into ONE corpus-wide combiner census."""
    import re as _re

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    word_re = _re.compile(r"[a-zà-ÿ]+")
    markers = _WINNOW_MARKERS
    d = len(markers)

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id": pd.Series(dtype="int64"),
                "y": pd.Series(dtype="int64"),
                **{f"x{j + 1}": pd.Series(dtype="int64")
                   for j in range(d)}}
        if df.empty:
            return pd.DataFrame(cols)
        n = len(df)
        wl = df["text"].fillna("").str.lower().str.findall(word_re)
        sets = [set(x) for x in wl]
        out = {"doc_id": df["doc_id"].to_numpy(np.int64)}
        for j, w in enumerate(markers):
            out[f"x{j + 1}"] = np.fromiter(
                (1 if w in s else 0 for s in sets),
                dtype=np.int64, count=n)
        out["y"] = np.where(out["x1"] + out["x2"] > 0, 1, -1) \
            .astype(np.int64)
        return pd.DataFrame(out)

    fds = ds.map_batches(feats, batch_format="pandas").materialize()
    sample = fds.map_batches(
        lambda df: df[df["doc_id"] < sample_max_id]
        if "doc_id" in df.columns else df,
        batch_format="pandas").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    w = [1.0] * d
    mistakes = 0
    for r in sample.itertuples():
        x = [int(getattr(r, f"x{j + 1}")) for j in range(d)]
        score = 0.0
        for j in range(d):
            score = score + w[j] * x[j]
        pred = 1 if score > theta else -1
        y = int(r.y)
        if pred != y:
            mistakes += 1
            for j in range(d):
                if x[j] == 1:
                    w[j] = w[j] * 2.0 if y == 1 else w[j] / 2.0
    import ray
    wref = ray.put(list(w))

    def eval_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "y" not in df.columns:
            return pd.DataFrame({"g": pd.Series(dtype="int64"),
                                 "ok": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        wv = ray.get(wref)
        score = np.zeros(len(df), dtype=np.float64)
        for j in range(d):
            score += wv[j] * df[f"x{j + 1}"].to_numpy(np.int64)
        pred = np.where(score > theta, 1, -1)
        ok = int((pred == df["y"].to_numpy(np.int64)).sum())
        return pd.DataFrame({"g": [0], "ok": [ok], "n": [len(df)]})

    ev = grouped_aggregate(
        fds.map_batches(eval_partial, batch_format="pandas"),
        ["g"], {"ok": ("ok", "sum"), "n": ("n", "sum")},
        result_hint="small").to_pandas()
    cols = {f"w_{m}": [float(w[j])] for j, m in enumerate(markers)}
    cols["mistakes"] = np.array([mistakes], dtype=np.int64)
    cols["n_correct"] = np.array([int(ev["ok"].iloc[0])],
                                 dtype=np.int64)
    cols["n_total"] = np.array([int(ev["n"].iloc[0])],
                               dtype=np.int64)
    return pd.DataFrame(cols)

def _winnow_oracle_sql(sample_max_id: int = 128,
                       theta: float = 5.0) -> str:
    m = _WINNOW_MARKERS
    d = len(m)
    fx = ",\n                   ".join(
        f"CASE WHEN len(list_filter(regexp_extract_all(lower(text), "
        f"'[a-zà-ÿ]+'), x -> x = '{w}')) > 0 THEN 1 ELSE 0 END "
        f"AS x{j + 1}"
        for j, w in enumerate(m))
    score = " + ".join(f"r.w{j + 1} * s.x{j + 1}" for j in range(d))
    pred = f"(CASE WHEN {score} > {theta} THEN 1 ELSE -1 END)"
    upd = ", ".join(
        f"CASE WHEN {pred} <> s.y AND s.x{j + 1} = 1 THEN "
        f"(CASE WHEN s.y = 1 THEN r.w{j + 1} * 2.0 "
        f"ELSE r.w{j + 1} / 2.0 END) ELSE r.w{j + 1} END"
        for j in range(d))
    updm = f"CASE WHEN {pred} <> s.y THEN r.mistakes + 1 " \
           f"ELSE r.mistakes END"
    fscore = " + ".join(f"fin.w{j + 1} * f.x{j + 1}"
                        for j in range(d))
    ones = ", ".join(f"CAST(1.0 AS DOUBLE) AS w{j + 1}"
                     for j in range(d))
    wsel = ", ".join(f"w{j + 1}" for j in range(d))
    wout = ", ".join(f"fin.w{j + 1} AS w_{w}"
                     for j, w in enumerate(m))
    return f"""
        WITH RECURSIVE f0 AS MATERIALIZED (
            SELECT doc_id, {fx}
            FROM documents),
        f AS MATERIALIZED (
            SELECT *, CASE WHEN x1 + x2 > 0 THEN 1 ELSE -1 END AS y
            FROM f0),
        s AS MATERIALIZED (
            SELECT *, row_number() OVER (ORDER BY doc_id) AS rn
            FROM f WHERE doc_id < {sample_max_id}),
        rec AS (
            SELECT 0 AS step, {ones},
                   CAST(0 AS BIGINT) AS mistakes
            UNION ALL
            SELECT r.step + 1, {upd}, {updm}
            FROM rec r JOIN s ON s.rn = r.step + 1),
        fin AS (SELECT {wsel}, mistakes FROM rec
                ORDER BY step DESC LIMIT 1)
        SELECT {wout}, fin.mistakes,
               (SELECT count(*) FILTER (WHERE
                    (CASE WHEN {fscore} > {theta} THEN 1
                          ELSE -1 END) = f.y)
                FROM f, fin) AS n_correct,
               (SELECT count(*) FROM f) AS n_total
        FROM fin"""

QUERIES = {
    'doc_bleu_pair': doc_bleu_pair,
    'doc_lz78': doc_lz78,
    'doc_theil_inequality': doc_theil_inequality,
    'doc_winnow': doc_winnow,
    'doc_source_logodds': doc_source_logodds,
    'doc_multi_pattern': doc_multi_pattern,
    'doc_string_complexity': doc_string_complexity,
    'doc_perceptron': doc_perceptron,
}

ORACLES = {
}
ORACLE_REGISTRY.update(ORACLES)
ORACLES['doc_source_logodds'] = ORACLE_REGISTRY['doc_source_logodds'] = _logodds_oracle_sql(
        alpha=0.01, top=10)
ORACLES['doc_multi_pattern'] = ORACLE_REGISTRY['doc_multi_pattern'] = _multi_pattern_oracle_sql(
        top=20, min_len=4)
ORACLES['doc_string_complexity'] = ORACLE_REGISTRY['doc_string_complexity'] = _STRING_COMPLEXITY_ORACLE_SQL
ORACLES['doc_bleu_pair'] = ORACLE_REGISTRY['doc_bleu_pair'] = _bleu_pair_oracle_sql()
ORACLES['doc_lz78'] = ORACLE_REGISTRY['doc_lz78'] = _LZ78_ORACLE_SQL
ORACLES['doc_theil_inequality'] = ORACLE_REGISTRY['doc_theil_inequality'] = _THEIL_ORACLE_SQL
ORACLES['doc_winnow'] = ORACLE_REGISTRY['doc_winnow'] = _winnow_oracle_sql(sample_max_id=128,
                                               theta=5.0)
ORACLES['doc_perceptron'] = ORACLE_REGISTRY['doc_perceptron'] = _perceptron_oracle_sql(
        sample_max_id=128)
