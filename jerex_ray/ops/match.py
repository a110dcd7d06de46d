"""Multi-pattern substring matching over a documents Dataset.

``AhoCorasickCounter`` is the classic one-pass multi-pattern matcher
(Aho & Corasick '75): a goto/fail automaton over the pattern set,
built ONCE PER ACTOR in ``__init__`` (the stateful actor-pool stage
contract — construction cost is amortized over every batch the actor
sees), then each document streams through the automaton once,
emitting ALL (overlapping) occurrences of every pattern — the
gazetteer/PII-lexicon scan a curation pipeline runs over 100 TB.

Counts are occurrence counts at every position (overlapping matches
included, unlike replace()/regex non-overlapping semantics), which is
what makes the SQL oracle exact: a positions × patterns lateral
substring equality replays every hit.

The reference has no multi-pattern matcher (its rule scorer matches
one name at a time, ``SURVEY.md §2.2``); engine extension for the
LLM-data charter.
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pandas as pd


class AhoCorasickCounter:
    """map_batches actor: per-doc occurrence counts per pattern."""

    def __init__(self, patterns: list[str]):
        self.patterns = list(patterns)
        # build goto / fail / output links
        self.goto: list[dict] = [{}]
        self.out: list[list[int]] = [[]]
        self.fail: list[int] = [0]
        for pi, p in enumerate(self.patterns):
            s = 0
            for ch in p:
                if ch not in self.goto[s]:
                    self.goto.append({})
                    self.out.append([])
                    self.fail.append(0)
                    self.goto[s][ch] = len(self.goto) - 1
                s = self.goto[s][ch]
            self.out[s].append(pi)
        q = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in self.goto[r].items():
                q.append(s)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[s] = self.goto[f].get(ch, 0) \
                    if self.goto[f].get(ch, 0) != s else 0
                self.out[s] = self.out[s] + self.out[self.fail[s]]

    def _count_doc(self, text: str) -> np.ndarray:
        counts = np.zeros(len(self.patterns), dtype=np.int64)
        s = 0
        for ch in text:
            while s and ch not in self.goto[s]:
                s = self.fail[s]
            s = self.goto[s].get(ch, 0)
            for pi in self.out[s]:
                counts[pi] += 1
        return counts

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, pats, ns = [], [], []
        for did, text in zip(batch["doc_id"],
                             batch["text"].fillna("")):
            c = self._count_doc(text.lower())
            nz = np.flatnonzero(c)
            ids.extend([int(did)] * len(nz))
            pats.extend(self.patterns[i] for i in nz)
            ns.extend(int(c[i]) for i in nz)
        return pd.DataFrame({
            "doc_id": np.array(ids, dtype=np.int64),
            "pattern": pd.Series(pats, dtype="object"),
            "n_matches": np.array(ns, dtype=np.int64)})


def run_multi_pattern_counts(docs_ds, patterns: list[str], *,
                             concurrency=(1, 4),
                             batch_size: int = 1024):
    """Actor-pool scan: automaton built once per actor, streamed
    over every batch."""
    return docs_ds.map_batches(
        AhoCorasickCounter, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_args=(patterns,))
