"""DocRED-format document source (reference fixture parity).

Parses the exact JSON shape the reference consumes
(``/root/reference/jerex/datasets.py:62-79,113-120,143-150`` /
FIXTURES.md §3):

    { title, sents: [[token,...],...],
      vertexSet: [[{type, pos:[s,e), sent_id}, ...], ...],   # one inner
      labels: [{r, h, t, evidence}, ...] }                    # list = one
                                                              # coref cluster

into (a) a transcript-shaped table (one turn per sentence — the
engine's native input), and (b) ground-truth mention/cluster/relation
tables for stage-level conformance tests (cluster type = first
mention's type, cluster phrase = first mention's phrase,
``datasets.py:126-128``; ``labels`` optional, ``datasets.py:65``).

The parser is driver-side for fixture files; ``read_docred`` wraps it
in ``ray.data.read_json``-compatible batches for larger corpora.
"""

from __future__ import annotations

import datetime as _dt
import json

import pyarrow as pa

_EPOCH = _dt.datetime(2026, 1, 1)


def parse_docred_file(path: str) -> list[dict]:
    with open(path) as f:
        docs = json.load(f)
    if isinstance(docs, dict):
        docs = [docs]
    return docs


def docred_to_transcripts(docs: list[dict]) -> pa.Table:
    """One row per sentence: conv_id = title, turn_idx = sent index,
    text = space-joined tokens (whitespace-tokenization round-trips)."""
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for doc in docs:
        title = doc["title"]
        for sidx, sent in enumerate(doc["sents"]):
            conv_ids.append(title)
            turn_idxs.append(sidx)
            roles.append("user")
            texts.append(" ".join(sent))
            tools.append("")
            tss.append(_EPOCH + _dt.timedelta(minutes=sidx))
    return pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    })


def docred_ground_truth(docs: list[dict]) -> dict[str, pa.Table]:
    """GT tables keyed by task, with the reference's identity rules:
    mention ≙ word-level (sent_id, start, end) span; cluster ≙ set of
    spans (+ type of first mention); relation ≙ (head idx, tail idx,
    type) resolved to cluster phrases."""
    m_rows = {"conv_id": [], "cluster": [], "sent_id": [],
              "start": [], "end": [], "phrase": [], "entity_type": []}
    c_rows = {"conv_id": [], "cluster": [], "phrase": [],
              "entity_type": [], "n_mentions": []}
    r_rows = {"conv_id": [], "subj": [], "subj_type": [], "pred": [],
              "obj": [], "obj_type": [], "evidence": []}
    for doc in docs:
        title = doc["title"]
        sents = doc["sents"]
        cluster_info = []
        for ci, cluster in enumerate(doc.get("vertexSet", [])):
            first = cluster[0]
            ctype = first["type"]                 # datasets.py:126-128
            fs, fe = first["pos"]
            cphrase = " ".join(sents[first["sent_id"]][fs:fe])
            cluster_info.append((cphrase, ctype))
            c_rows["conv_id"].append(title)
            c_rows["cluster"].append(ci)
            c_rows["phrase"].append(cphrase)
            c_rows["entity_type"].append(ctype)
            c_rows["n_mentions"].append(len(cluster))
            for m in cluster:
                s, e = m["pos"]
                m_rows["conv_id"].append(title)
                m_rows["cluster"].append(ci)
                m_rows["sent_id"].append(m["sent_id"])
                m_rows["start"].append(s)
                m_rows["end"].append(e)
                m_rows["phrase"].append(" ".join(sents[m["sent_id"]][s:e]))
                m_rows["entity_type"].append(m["type"])
        for rel in doc.get("labels", []):        # optional, datasets.py:65
            h, t = rel["h"], rel["t"]
            r_rows["conv_id"].append(title)
            r_rows["subj"].append(cluster_info[h][0])
            r_rows["subj_type"].append(cluster_info[h][1])
            r_rows["pred"].append(rel["r"])
            r_rows["obj"].append(cluster_info[t][0])
            r_rows["obj_type"].append(cluster_info[t][1])
            r_rows["evidence"].append(rel.get("evidence", []))
    return {
        "mentions": pa.table({
            "conv_id": pa.array(m_rows["conv_id"], pa.string()),
            "cluster": pa.array(m_rows["cluster"], pa.int32()),
            "sent_id": pa.array(m_rows["sent_id"], pa.int32()),
            "start": pa.array(m_rows["start"], pa.int32()),
            "end": pa.array(m_rows["end"], pa.int32()),
            "phrase": pa.array(m_rows["phrase"], pa.string()),
            "entity_type": pa.array(m_rows["entity_type"], pa.string()),
        }),
        "clusters": pa.table({
            "conv_id": pa.array(c_rows["conv_id"], pa.string()),
            "cluster": pa.array(c_rows["cluster"], pa.int32()),
            "phrase": pa.array(c_rows["phrase"], pa.string()),
            "entity_type": pa.array(c_rows["entity_type"], pa.string()),
            "n_mentions": pa.array(c_rows["n_mentions"], pa.int32()),
        }),
        "relations": pa.table({
            "conv_id": pa.array(r_rows["conv_id"], pa.string()),
            "subj": pa.array(r_rows["subj"], pa.string()),
            "subj_type": pa.array(r_rows["subj_type"], pa.string()),
            "pred": pa.array(r_rows["pred"], pa.string()),
            "obj": pa.array(r_rows["obj"], pa.string()),
            "obj_type": pa.array(r_rows["obj_type"], pa.string()),
            "evidence": pa.array(r_rows["evidence"], pa.list_(pa.int32())),
        }),
    }


def read_docred(path: str):
    """DocRED JSON-array file → transcripts Dataset. Driver-side parse:
    right for the reference's fixture files (one ``json.load``-able
    array, ``datasets.py:57-59``). For corpus-scale DocRED-format data
    use ``read_docred_jsonl`` — it streams."""
    import ray.data as rd

    from jerex_ray.runtime import configure_data_context
    configure_data_context()
    return rd.from_arrow(docred_to_transcripts(parse_docred_file(path)))


def read_docred_jsonl(path: str, *, batch_size: int = 256):
    """Streaming DocRED ingestion: JSONL (one document per line) →
    transcripts Dataset via ``ray.data.read_json``. Documents never
    materialize on the driver — each block of parsed docs is converted
    to transcript rows inside ``map_batches``, so a multi-TB
    DocRED-format corpus streams block-by-block with backpressure
    (replaces the reference's whole-file ``json.load``,
    ``datasets.py:57-59``)."""
    import ray.data as rd

    from jerex_ray.runtime import configure_data_context
    configure_data_context()
    ds = rd.read_json(path)

    def to_transcripts(batch) -> pa.Table:
        docs = batch.to_pylist() if isinstance(batch, pa.Table) else batch
        return docred_to_transcripts(docs)

    return ds.map_batches(to_transcripts, batch_format="pyarrow",
                          batch_size=batch_size)
