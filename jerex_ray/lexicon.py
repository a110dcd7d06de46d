"""Frozen lexicons and cue rules for the deterministic stub scorer.

The sandbox has no torch/transformers, so the JEREX model weights are
replaced by a deterministic rule scorer (SURVEY.md §7.0): it honors the
full JEREX inference dataflow (candidate spans → mention logits →
coref pair scores → complete-linkage clusters → entity typing →
multi-instance relation max-pool → thresholds) but computes its
"logits" from frozen surface rules instead of BERT. The reference-pinned
extractions the P/R≥0.95 gate compares against are produced by these
same frozen semantics. A real HF checkpoint can be dropped into
``stages/scorer.py`` behind the same actor interface.
"""

from __future__ import annotations

import re

# Token shape that can start/continue an entity mention surface.
NAME_TOKEN_RE = re.compile(r"^[A-Z][A-Za-z0-9]*$")

# Capitalized tokens that never start a mention (sentence-initial words,
# pronouns) — keeps the rule-based mention localizer precise.
CAP_STOPWORDS = frozenset({
    "The", "A", "An", "It", "He", "She", "They", "We", "I", "You",
    "This", "That", "These", "Those", "There", "Here", "What", "Where",
    "When", "Who", "Why", "How", "Yes", "No", "Ok", "Okay", "Please",
    "Thanks", "Hello", "Hi",
})

ORG_SUFFIXES = frozenset({"Corp", "Inc", "Labs", "Systems", "Group", "Ltd"})

CITIES = frozenset({
    "Berlin", "Paris", "London", "Tokyo", "Osaka", "Madrid", "Rome",
    "Vienna", "Zurich", "Geneva", "Oslo", "Stockholm", "Helsinki",
    "Lisbon", "Dublin", "Prague", "Warsaw", "Budapest", "Athens",
    "Seoul", "Taipei", "Singapore", "Sydney", "Auckland", "Toronto",
    "Montreal", "Chicago", "Boston", "Seattle", "Austin", "Denver",
    "Portland", "Atlanta", "Dallas", "Houston", "Phoenix", "Miami",
    "Nairobi", "Cairo", "Lagos", "Mumbai", "Delhi", "Jakarta",
})

TOOL_SUFFIX = "Tool"

# entity-type rule: ORG by suffix, TOOL by suffix, LOC by gazetteer,
# PER fallback (mirrors JEREX's argmax entity classifier J7 as a
# deterministic decision function over the cluster representative).
def entity_type_of(phrase_tokens: list[str]) -> str:
    if phrase_tokens and phrase_tokens[-1] in ORG_SUFFIXES:
        return "ORG"
    if phrase_tokens and phrase_tokens[-1].endswith(TOOL_SUFFIX):
        return "TOOL"
    if len(phrase_tokens) == 1 and phrase_tokens[0] in CITIES:
        return "LOC"
    return "PER"


# relation cue rules: evaluated on the lowercased context tokens
# STRICTLY BETWEEN an ordered mention pair (create_rel_mask semantics,
# /root/reference/jerex/sampling/sampling_common.py:324-330), gated by
# (head_type, tail_type) like JEREX's entity-type embeddings (J9).
WORKS_AT_CUES = frozenset({"joined", "works", "hired"})
LOCATED_IN_CUES = frozenset({"headquartered", "based", "located", "lives", "moved"})
USES_TOOL_CUES = frozenset({"uses", "ran", "invoked", "launched"})


def relation_cue(between_tokens: list[str], head_type: str, tail_type: str) -> str | None:
    """Return relation identifier if the between-context carries a cue
    compatible with the (head, tail) entity types, else None. Head must
    precede tail in text (the caller guarantees ordered pairs)."""
    toks = set(t.lower() for t in between_tokens)
    if head_type == "PER" and tail_type == "ORG" and toks & WORKS_AT_CUES:
        return "works_at"
    if head_type in ("PER", "ORG") and tail_type == "LOC" and toks & LOCATED_IN_CUES and "in" in toks:
        return "located_in"
    if head_type == "PER" and tail_type == "TOOL" and toks & USES_TOOL_CUES:
        return "uses_tool"
    return None


def is_name_token(tok: str) -> bool:
    return bool(NAME_TOKEN_RE.match(tok)) and tok not in CAP_STOPWORDS


# --- coref stub scoring (J3/J4 semantics: a deterministic function of
# the decoded phrases and their edit distance) ---

def coref_score(phrase1: str, phrase2: str, ed: int) -> float:
    """Sigmoid-equivalent pair score in [0, 1]. Threshold is 0.85."""
    p1, p2 = phrase1.lower().strip(), phrase2.lower().strip()
    if p1 == p2:
        return 0.98
    w1, w2 = p1.split(), p2.split()
    # surname-alias rule: "alice chen" ~ "chen"
    if w1 and w2 and w1[-1] == w2[-1] and (len(w1) == 1 or len(w2) == 1):
        return 0.95
    m = max(len(p1), len(p2))
    if m > 0 and ed / m <= 0.2:
        return 0.92
    return 0.02
