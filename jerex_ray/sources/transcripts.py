"""Deterministic synthetic transcript source with planted ground truth.

Produces the graft's authoritative input shape (BASELINE.json
``input_hint``): Parquet-compatible rows
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us])``.

Every conversation is generated from a per-conv RNG seeded by a stable
content hash of its conv_id (shard-independent — contrast with the
reference's global parse-order IDs, ``/root/reference/jerex/datasets.py:41-48``),
so generation can run distributed via ``ray.data.range(n).map_batches``
and any shard produces identical rows.

Planted structure (so ground truth is known by construction,
FIXTURES.md §1): entity mentions are TitleCase token runs from frozen
lexicons, coreference aliases are surname shortenings, relations are
cue-verb sentences. Corner cases: filler-only convs (no mentions),
single-mention convs (no relations), a hot entity ("Acme Corp")
appearing in ~1/7 of convs (canonicalization skew), and long convs
exceeding the 700-sub-word ceiling (chunking policy exercise, reference
``models/__init__.py:57-67``).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

from jerex_ray.lexicon import CITIES
from jerex_ray.util import conv_seed

FIRST_NAMES = [
    "Alice", "Bob", "Carol", "David", "Erin", "Frank", "Grace", "Henry",
    "Irene", "Jack", "Karen", "Liam", "Mona", "Nathan", "Olga", "Peter",
    "Quinn", "Rosa", "Sam", "Tina", "Umar", "Vera", "Walt", "Xenia",
]
LAST_NAMES = [
    "Chen", "Smith", "Garcia", "Mueller", "Tanaka", "Okafor", "Silva",
    "Novak", "Kim", "Patel", "Rossi", "Dubois", "Larsen", "Ivanov",
    "Costa", "Haddad", "Nguyen", "Berg", "Fischer", "Moreau", "Santos",
    "Weber", "Yamada", "Zhang",
]
ORG_HEADS = [
    "Vertex", "Nimbus", "Quantum", "Stellar", "Apex", "Orion", "Zenith",
    "Cobalt", "Falcon", "Aurora", "Titan", "Vector", "Nova", "Summit",
    "Pioneer", "Atlas", "Horizon", "Cascade", "Meridian", "Polaris",
]
ORG_TAILS = ["Corp", "Inc", "Labs", "Systems", "Group", "Ltd"]
CITY_LIST = sorted(CITIES)
TOOL_NAMES = [
    "SearchTool", "GrepTool", "BuildTool", "DeployTool", "QueryTool",
    "ParseTool", "IndexTool", "MergeTool", "TraceTool", "AuditTool",
]
HOT_ORG = ("Acme", "Corp")  # appears in ~1/7 of standard convs

FILLER_TURNS = [
    "ok thanks for the update .",
    "please summarize the report when you can .",
    "sounds good , let me check the logs first .",
    "the pipeline finished without errors yesterday .",
    "can you rerun the last step with more memory ?",
    "sure , i will take a look at the results now .",
    "that matches what we expected from the earlier run .",
    "noted , moving on to the next item on the list .",
]
LONG_FILLER = ("we reviewed the metrics again and the numbers look stable "
               "across all of the recent batches so far .")

_EPOCH = _dt.datetime(2026, 1, 1)

# (idx, entities) of the most recent _conv_script call — lets
# _conv_entities piggyback on the deterministic generator without
# changing the (turns, gt) return shape its existing callers unpack
_LAST_ENTITIES: list = [(-1, [])]


def _conv_entities(idx: int) -> list[tuple]:
    """Planted entities of conversation ``idx`` as (phrase, type,
    alias_phrases): every surface the corpus expresses for the entity
    (surname aliases of persons). Replays the deterministic script."""
    last_idx, ents = _LAST_ENTITIES[0]
    if last_idx != idx:
        _conv_script(idx)
        _, ents = _LAST_ENTITIES[0]
    return ents


def _conv_script(idx: int) -> tuple[list[tuple[str, str, str]], list[tuple]]:
    # NOTE: also exposes the planted ENTITIES via _conv_entities(idx)
    # (phrase, type, aliases) — derived in lockstep below.
    """Returns (turns, gt_triples) for conversation ``idx``.

    turns: list of (role, text, tool); gt_triples: list of
    (subj, subj_type, pred, obj, obj_type, evidence_turn) — the turn
    index that expresses the relation (reference keeps evidence
    sentences on each Relation, ``entities.py:341-374`` /
    ``datasets.py:144-159``).
    """
    conv_id = conv_id_for(idx)
    rng = np.random.default_rng(conv_seed(conv_id))

    kind_roll = rng.random()
    person = f"{FIRST_NAMES[rng.integers(len(FIRST_NAMES))]} {LAST_NAMES[rng.integers(len(LAST_NAMES))]}"
    surname = person.split()[1]
    if idx % 7 == 0:
        org = f"{HOT_ORG[0]} {HOT_ORG[1]}"
    else:
        org = f"{ORG_HEADS[rng.integers(len(ORG_HEADS))]} {ORG_TAILS[rng.integers(len(ORG_TAILS))]}"
    city = CITY_LIST[rng.integers(len(CITY_LIST))]
    tool = TOOL_NAMES[rng.integers(len(TOOL_NAMES))]

    turns: list[tuple[str, str, str]] = []
    gt: list[tuple] = []
    ents: list[tuple] = []
    _LAST_ENTITIES[0] = (idx, ents)

    def filler(n=1):
        for _ in range(n):
            turns.append(("user" if len(turns) % 2 == 0 else "assistant",
                          FILLER_TURNS[rng.integers(len(FILLER_TURNS))], ""))

    if kind_roll < 0.10:
        # filler-only conversation: no mentions at all
        filler(int(rng.integers(2, 6)))
        return turns, gt

    if kind_roll < 0.15:
        # single-mention conversation: one entity, no relations
        turns.append(("user", f"please check the status for {city} today .", ""))
        filler(1)
        ents.append((city, "LOC", ()))
        return turns, gt

    # --- standard conversation ---
    ents.append((person, "PER", (surname,)))
    ents.append((org, "ORG", ()))
    ents.append((city, "LOC", ()))
    ents.append((tool, "TOOL", ()))
    filler(1)
    turns.append(("assistant", f"{person} joined {org} this quarter .", ""))
    gt.append((person, "PER", "works_at", org, "ORG", len(turns) - 1))
    turns.append(("user", f"where is {surname} right now ?", ""))
    turns.append(("assistant", f"{org} is headquartered in {city} .", ""))
    gt.append((org, "ORG", "located_in", city, "LOC", len(turns) - 1))
    turns.append(("tool", f"{surname} ran {tool} on the cluster .", tool.lower()))
    gt.append((person, "PER", "uses_tool", tool, "TOOL", len(turns) - 1))

    if 0.15 <= kind_roll < 0.25:
        # second person at the same org
        p2 = f"{FIRST_NAMES[rng.integers(len(FIRST_NAMES))]} {LAST_NAMES[rng.integers(len(LAST_NAMES))]}"
        while p2.split()[1] == surname:
            p2 = f"{FIRST_NAMES[rng.integers(len(FIRST_NAMES))]} {LAST_NAMES[rng.integers(len(LAST_NAMES))]}"
        turns.append(("assistant", f"{p2} works at {org} as well .", ""))
        gt.append((p2, "PER", "works_at", org, "ORG", len(turns) - 1))
        ents.append((p2, "PER", (p2.split()[1],)))

    filler(1)

    if kind_roll >= 0.95:
        # long conversation: filler past the 700-sub-word ceiling, then a
        # late repeat of a relation (duplicate triple → dedup exercise,
        # and mentions in a chunk > 0)
        for _ in range(80):
            turns.append(("assistant", LONG_FILLER, ""))
        turns.append(("assistant", f"{person} joined {org} this quarter .", ""))
        # duplicate of gt[0]; counted once (scoring.py:16-23 dedup
        # union) — but the late turn is a second valid EVIDENCE for
        # the triple (ground_truth_triples merges evidence on dedup)
        gt.append((person, "PER", "works_at", org, "ORG", len(turns) - 1))

    return turns, gt


def conv_id_for(idx: int) -> str:
    return f"conv-{idx:08d}"


def _rows_for_indices(indices: np.ndarray) -> dict[str, np.ndarray]:
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for idx in indices.tolist():
        conv_id = conv_id_for(idx)
        turns, _ = _conv_script(idx)
        base = _EPOCH + _dt.timedelta(hours=int(idx) % 100_000)
        for t, (role, text, tool) in enumerate(turns):
            conv_ids.append(conv_id)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append(base + _dt.timedelta(minutes=t))
    return {
        "conv_id": np.asarray(conv_ids, dtype=object),
        "turn_idx": np.asarray(turn_idxs, dtype=np.int32),
        "role": np.asarray(roles, dtype=object),
        "text": np.asarray(texts, dtype=object),
        "tool": np.asarray(tools, dtype=object),
        "ts": np.asarray(tss, dtype="datetime64[us]"),
    }


_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def generate_transcripts_table(num_convs: int, start: int = 0) -> pa.Table:
    """In-memory table for tests / small fixtures."""
    cols = _rows_for_indices(np.arange(start, start + num_convs))
    return pa.table(
        {k: pa.array(v.tolist() if v.dtype == object else v) for k, v in cols.items()},
        schema=_SCHEMA)


def read_synthetic_transcripts(num_convs: int, *, override_num_blocks: int | None = None):
    """Distributed transcript source: ``ray.data.range`` over conv
    indices → ``map_batches`` generation. Scales to any corpus size
    without a driver-side loop."""
    import ray.data as rd

    def gen(batch: dict[str, np.ndarray]) -> pa.Table:
        cols = _rows_for_indices(batch["id"])
        return pa.table(
            {k: pa.array(v.tolist() if v.dtype == object else v)
             for k, v in cols.items()}, schema=_SCHEMA)

    ds = rd.range(num_convs, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen, batch_format="numpy", batch_size=256)


def ground_truth_triples(num_convs: int, start: int = 0) -> pa.Table:
    """Planted (conv_id, subj, subj_type, pred, obj, obj_type) triples,
    deduplicated per conversation (duplicates count once —
    reference ``scoring.py:16-23`` / README.md:62). ``evidence`` holds
    EVERY turn index that expresses the triple (a duplicate plant
    merges its turn into the first row's list)."""
    return _gt_triples_for_indices(range(start, start + num_convs))


def _gt_triples_for_indices(indices) -> pa.Table:
    conv_ids, subjs, stypes, preds, objs, otypes = [], [], [], [], [], []
    evidences: list[list[int]] = []
    for idx in indices:
        conv_id = conv_id_for(idx)
        _, gt = _conv_script(idx)
        seen: dict[tuple, int] = {}
        for s, st, p, o, ot, ev in gt:
            key = (s, p, o)
            if key in seen:
                row = seen[key]
                if ev not in evidences[row]:
                    evidences[row].append(ev)
                continue
            seen[key] = len(conv_ids)
            conv_ids.append(conv_id)
            subjs.append(s)
            stypes.append(st)
            preds.append(p)
            objs.append(o)
            otypes.append(ot)
            evidences.append([ev])
    return pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "subj": pa.array(subjs, pa.string()),
        "subj_type": pa.array(stypes, pa.string()),
        "pred": pa.array(preds, pa.string()),
        "obj": pa.array(objs, pa.string()),
        "obj_type": pa.array(otypes, pa.string()),
        "evidence": pa.array(evidences, pa.list_(pa.int32())),
    })


def read_ground_truth_triples(num_convs: int, *,
                              override_num_blocks: int | None = None):
    """Distributed GT-triples source: the same planted triples as
    ``ground_truth_triples`` but generated per index block
    (``ray.data.range`` → ``map_batches``) — GT never materializes on
    the driver, so the distributed eval join
    (``evaluate_triples_distributed``) runs with BOTH sides
    arbitrary-sized."""
    import ray.data as rd

    def gen(batch: dict[str, np.ndarray]) -> pa.Table:
        return _gt_triples_for_indices(int(i) for i in batch["id"])

    ds = rd.range(num_convs, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen, batch_format="numpy", batch_size=256)


def _phrase_occurrences(turn_tokens: list[list[str]],
                        words: list[str]) -> list[tuple[int, int, int]]:
    n = len(words)
    out = []
    for ti, toks in enumerate(turn_tokens):
        for i in range(len(toks) - n + 1):
            if toks[i:i + n] == words:
                out.append((ti, i, i + n))
    return out


def ground_truth_structures(num_convs: int, start: int = 0) -> dict:
    """Conv-level ground truth at ALL FOUR of the reference's joint
    eval levels (``joint_evaluator.py`` tables): mentions, coreference
    clusters, typed entities, relations.

    Identities follow the reference's (``conversion.py:4-10``) with the
    chunk-invariant mention key (turn, within-turn word span): a
    mention is every occurrence of a planted entity surface (surname
    aliases of persons included, full-name occurrences excluded from
    alias matches); a cluster is the frozenset of the entity's mention
    keys; an entity is (cluster, type); a relation is (head cluster,
    tail cluster, type) — plus types for the strict rel_nec variant.

    Returns {conv_id: {"mentions": [...], "clusters": [...],
    "entities": [...], "relations": [...]}} (relations carry
    (head, head_type, tail, tail_type, rtype))."""
    out = {}
    for idx in range(start, start + num_convs):
        conv_id = conv_id_for(idx)
        turns, gt = _conv_script(idx)
        ents = _conv_entities(idx)
        turn_tokens = [t[1].split() for t in turns]
        clusters, types, by_phrase = [], [], {}
        for phrase, typ, aliases in ents:
            spans = _phrase_occurrences(turn_tokens, phrase.split())
            covered = set(spans)
            for al in aliases:
                for ti, i, j in _phrase_occurrences(turn_tokens,
                                                    al.split()):
                    inside = any(ti == t2 and i >= s2 and j <= e2
                                 for (t2, s2, e2) in covered)
                    if not inside:
                        spans.append((ti, i, j))
            cl = frozenset(spans)
            clusters.append(cl)
            types.append(typ)
            by_phrase[phrase] = (cl, typ)
        rels = []
        seen = set()
        for s, st, p, o, ot, _ev in gt:
            key = (s, p, o)
            if key in seen:
                continue
            seen.add(key)
            rels.append((by_phrase[s][0], st, by_phrase[o][0], ot, p))
        out[conv_id] = {
            "mentions": [m for cl in clusters for m in cl],
            "clusters": list(clusters),
            "entities": list(zip(clusters, types)),
            "relations": rels,
        }
    return out
