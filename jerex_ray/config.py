"""Pipeline configuration.

Mirrors the decision thresholds and work-bounding knobs of the
reference (``/root/reference/configs.py:31-33,49,61,97-130``) so the
frozen extraction semantics are reproducible, plus Ray-side execution
knobs (batch sizes, actor-pool concurrency, partition counts) that the
reference has no equivalent for.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- decision thresholds (reference configs.py:31-33) ---
    mention_threshold: float = 0.85
    coref_threshold: float = 0.85
    rel_threshold: float = 0.6

    # --- work-bounding knobs (reference configs.py:49,61,97-130) ---
    max_span_size: int = 10           # candidate span width cap, per sentence
    context_size: int = 700           # sub-word ceiling per document chunk
                                      # (position_embeddings_count, models/__init__.py:57-67)
    max_spans: int | None = None      # chunking caps inside the scorer; None = whole doc
    max_coref_pairs: int | None = None
    max_rel_pairs: int | None = None

    # --- Ray execution knobs (no reference equivalent; ours) ---
    assemble_batch_size: int = 1024   # transcript rows per batch pre-shuffle
    score_batch_size: int = 32        # assembled docs per scorer-actor batch
    scorer_concurrency: int | tuple[int, int] | None = None  # None = size
                                      # the autoscaling pool to the cluster
                                      # (runtime.pool_concurrency); min stays
                                      # small so pools never starve the
                                      # read/shuffle stages of CPUs
    tokenizer_concurrency: int | tuple[int, int] | None = None  # same; the
                                      # two pools are sized separately so
                                      # fixed-size fleets can't deadlock
    actor_num_cpus: float = 1.0       # CPUs reserved per pool actor; <1
                                      # oversubscribes (useful only on tiny
                                      # test clusters)
    num_output_partitions: int = 16   # triple sink partitions (hash of conv_id)
    salt_buckets: int = 8             # sub-buckets for hot canonicalization keys
    fused_scoring: bool = True        # one tokenize+score actor pool: the
                                      # encoded-doc intermediate never ships
                                      # through the object store and only one
                                      # actor fleet starts. False = separate
                                      # pools (needed only when the scorer
                                      # runs on different resources, e.g.
                                      # num_gpus=1 for a real HF checkpoint).
    assembly_locality: str = "shuffle"  # "auto": assemble convs block-locally
                                      # and shuffle only block-boundary convs
                                      # (transcript tables are normally
                                      # conv-contiguous on disk); requires a
                                      # re-traversable input plan. "shuffle":
                                      # always hash-repartition (any layout).

    # --- canonicalization ---
    hot_key_threshold: int = 10_000   # per-batch partial-count above which a key is salted

    def scaled_for_tests(self) -> "PipelineConfig":
        """Small partition counts for unit-test-sized inputs."""
        return PipelineConfig(
            mention_threshold=self.mention_threshold,
            coref_threshold=self.coref_threshold,
            rel_threshold=self.rel_threshold,
            max_span_size=self.max_span_size,
            context_size=self.context_size,
            num_output_partitions=4,
            scorer_concurrency=(1, 2),
            tokenizer_concurrency=(1, 2),
            actor_num_cpus=0.5,
        )


DEFAULT_CONFIG = PipelineConfig()
