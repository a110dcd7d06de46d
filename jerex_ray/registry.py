"""Extension surface (§2.10): model + stage registries.

The reference exposes a de-facto plugin contract — a string-keyed
model registry (``/root/reference/jerex/models/__init__.py:9-24``,
``model.model_type`` selects the class) and per-class behavior via
class attributes. This module is the engine's equivalent:

* ``MODEL_REGISTRY`` — scorer-actor classes by model_type string.
  ``joint_multi_instance`` / ``joint_global`` map to the numpy
  head-math model in its two relation-classification variants
  (mirroring ``JointMultiInstanceModel`` / ``JointGlobalModel``);
  ``rule`` is the frozen decision-rule scorer (the P/R-gate
  reference semantics); ``hf`` is the real-checkpoint GPU actor.
* ``STAGE_REGISTRY`` — named pipeline stages (Dataset → Dataset
  callables) so a pipeline can be assembled from a config list
  (``build_pipeline``), the engine's analogue of the reference's
  hydra-driven composition (``configs.py``).

Register your own with ``@register_model("name")`` /
``@register_stage("name")``.
"""

from __future__ import annotations

from typing import Callable

from jerex_ray.config import PipelineConfig

MODEL_REGISTRY: dict[str, tuple] = {}
STAGE_REGISTRY: dict[str, Callable] = {}


def register_model(name: str, **default_kwargs):
    def deco(cls):
        MODEL_REGISTRY[name] = (cls, default_kwargs)
        return cls
    return deco


def register_stage(name: str):
    def deco(fn):
        STAGE_REGISTRY[name] = fn
        return fn
    return deco


def resolve_model(model_type: str) -> tuple:
    """model_type string → (scorer class, constructor kwargs), like
    the reference's ``models.get_model`` lookup."""
    _ensure_builtin()
    if model_type not in MODEL_REGISTRY:
        raise KeyError(f"unknown model_type {model_type!r}; "
                       f"registered: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[model_type]


def build_pipeline(ds, stages: list[str],
                   config: PipelineConfig | None = None):
    """Assemble a Dataset pipeline from stage names — config-driven
    DAG assembly. Each stage is ``fn(ds, config) -> ds``."""
    _ensure_builtin()
    cfg = config or PipelineConfig()
    for name in stages:
        if name not in STAGE_REGISTRY:
            raise KeyError(f"unknown stage {name!r}; "
                           f"registered: {sorted(STAGE_REGISTRY)}")
        ds = STAGE_REGISTRY[name](ds, cfg)
    return ds


_BUILTIN = False


def _ensure_builtin():
    global _BUILTIN
    if _BUILTIN:
        return
    # flag is set only AFTER successful registration: a transient
    # import failure must surface again on the next call, not leave an
    # empty registry behind

    from jerex_ray.stages.assemble import assemble_documents
    from jerex_ray.stages.bucket import length_bucket
    from jerex_ray.stages.canonicalize import canonicalize_triples
    from jerex_ray.stages.convert import explode_triples
    from jerex_ray.stages.numpy_scorer import NumpyScorer
    from jerex_ray.stages.scorer import HFScorer, RuleScorer, score_documents
    from jerex_ray.stages.tokenize import tokenize_documents

    MODEL_REGISTRY.setdefault("rule", (RuleScorer, {}))
    MODEL_REGISTRY.setdefault("joint_multi_instance",
                              (NumpyScorer, {"variant": "multi_instance"}))
    MODEL_REGISTRY.setdefault("joint_global",
                              (NumpyScorer, {"variant": "global"}))
    MODEL_REGISTRY.setdefault("hf", (HFScorer, {}))

    def _part_key_stage(ds, cfg):
        from jerex_ray.pipelines.kg import _with_part_key
        return _with_part_key(ds, cfg)

    STAGE_REGISTRY.setdefault("part_key", _part_key_stage)
    STAGE_REGISTRY.setdefault(
        "assemble", lambda ds, cfg: assemble_documents(ds))
    STAGE_REGISTRY.setdefault(
        "tokenize", lambda ds, cfg: tokenize_documents(ds, cfg))
    STAGE_REGISTRY.setdefault(
        "length_bucket", lambda ds, cfg: length_bucket(ds))
    for mt in ("rule", "joint_multi_instance", "joint_global"):
        def _score(ds, cfg, _mt=mt):
            cls, kw = resolve_model(_mt)
            return score_documents(ds, cfg, scorer_cls=cls,
                                   scorer_kwargs=kw)
        STAGE_REGISTRY.setdefault(f"score:{mt}", _score)
    STAGE_REGISTRY.setdefault(
        "triples", lambda ds, cfg: ds.map_batches(
            explode_triples, batch_format="pyarrow"))
    STAGE_REGISTRY.setdefault(
        "canonicalize", lambda ds, cfg: ds.map_batches(
            canonicalize_triples, batch_format="pandas"))

    # document-table stages (LLM-data ops) — composable into cleaning
    # pipelines: ["dedup:exact", "langid", "split"] etc.
    from jerex_ray.ops.dedup import exact_dedup
    from jerex_ray.ops.split import hash_split
    from jerex_ray.ops.textstats import (run_langid, run_quality_stats,
                                         run_token_stats)
    STAGE_REGISTRY.setdefault("dedup:exact",
                              lambda ds, cfg: exact_dedup(ds))
    STAGE_REGISTRY.setdefault("split", lambda ds, cfg: hash_split(ds))
    STAGE_REGISTRY.setdefault("langid", lambda ds, cfg: run_langid(ds))
    STAGE_REGISTRY.setdefault("token_stats",
                              lambda ds, cfg: run_token_stats(ds))
    STAGE_REGISTRY.setdefault("quality_stats",
                              lambda ds, cfg: run_quality_stats(ds))

    from jerex_ray.ops.substr import duplicate_spans
    STAGE_REGISTRY.setdefault("dup_spans",
                              lambda ds, cfg: duplicate_spans(ds))

    def _buckets(ds, cfg):
        from jerex_ray.ops.quantiles import grouped_quantile_buckets
        return grouped_quantile_buckets(ds, "event_type", "value")

    STAGE_REGISTRY.setdefault("value_buckets", _buckets)

    _BUILTIN = True
