"""Type vocabulary: entity and relation types with dense indices.

Mirrors the reference's ``types.json`` loader
(``/root/reference/jerex/data_module.py:25-46``): insertion order
defines dense class indices, which are load-bearing because classifier
output columns are positional. Here the vocabulary is a small frozen
value object broadcast into actors by value (Ray serializes it once
per actor), never a shared mutable structure.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class EntityType:
    identifier: str
    index: int
    short_name: str
    verbose_name: str


@dataclass(frozen=True)
class RelationType:
    identifier: str
    index: int
    short_name: str
    verbose_name: str
    symmetric: bool = False  # parsed but unused downstream, as in the reference
                             # (data_module.py:39; never consumed at eval)


class TypeVocabulary:
    """Ordered entity/relation type registry with dense indices."""

    def __init__(self, entities: dict[str, dict], relations: dict[str, dict]):
        self.entity_types: dict[str, EntityType] = {}
        self.relation_types: dict[str, RelationType] = {}
        for i, (key, spec) in enumerate(entities.items()):
            self.entity_types[key] = EntityType(
                key, i, spec.get("short", key), spec.get("verbose", key))
        for i, (key, spec) in enumerate(relations.items()):
            self.relation_types[key] = RelationType(
                key, i, spec.get("short", key), spec.get("verbose", key),
                bool(spec.get("symmetric", False)))
        # positional lookups (classifier columns are positional,
        # reference models/__init__.py:37-38)
        self.entity_index: list[str] = list(self.entity_types)
        self.relation_index: list[str] = list(self.relation_types)

    @classmethod
    def from_json(cls, path: str) -> "TypeVocabulary":
        with open(path) as f:
            spec = json.load(f)
        return cls(spec["entities"], spec["relations"])

    def entity_id(self, key: str) -> int:
        return self.entity_types[key].index

    def relation_id(self, key: str) -> int:
        return self.relation_types[key].index

    def __reduce__(self):
        ents = {k: {"short": v.short_name, "verbose": v.verbose_name}
                for k, v in self.entity_types.items()}
        rels = {k: {"short": v.short_name, "verbose": v.verbose_name,
                    "symmetric": v.symmetric}
                for k, v in self.relation_types.items()}
        return (TypeVocabulary, (ents, rels))


# Frozen default vocabulary for the transcript-KG domain (FIXTURES.md §2).
DEFAULT_TYPES = TypeVocabulary(
    entities={
        "PER": {"short": "Person", "verbose": "Person"},
        "ORG": {"short": "Org", "verbose": "Organization"},
        "LOC": {"short": "Loc", "verbose": "Location"},
        "TOOL": {"short": "Tool", "verbose": "Tool"},
    },
    relations={
        "works_at": {"short": "works_at", "verbose": "works at", "symmetric": False},
        "located_in": {"short": "located_in", "verbose": "located in", "symmetric": False},
        "uses_tool": {"short": "uses_tool", "verbose": "uses tool", "symmetric": False},
    },
)
