"""Ray Data execution-context configuration (no session ownership).

This module never calls ``ray.init``/``ray.shutdown`` — it only tunes
the ``DataContext`` of the already-running session. Idempotent; called
at the top of every pipeline entry point.
"""

from __future__ import annotations


def configure_data_context(quiet: bool = True, ds=None) -> None:
    """Configure the global DataContext and, if ``ds`` is given, the
    context snapshot that Dataset captured at creation time (Ray 2.49
    plans against the captured context, not the global one)."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    contexts = [DataContext.get_current()]
    if ds is not None and getattr(ds, "context", None) is not None:
        contexts.append(ds.context)
    for ctx in contexts:
        # Hash-shuffle is required for key-based repartition and is the
        # scalable strategy for the conv_id / part_key exchanges this
        # engine is built around (partial/final aggregates,
        # hash-partitioned sinks).
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # Size the shuffle to the cluster: the library default (200
        # partitions, 1 CPU per aggregator) deadlocks a small cluster
        # when actor-pool stages already hold CPUs. Fractional CPUs per
        # aggregator let shuffle aggregators coexist with actor pools.
        ctx.default_hash_shuffle_parallelism = shuffle_partitions()
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.125
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.125
        if quiet:
            ctx.enable_progress_bars = False
            try:
                ctx.execution_options.verbose_progress = False
            except AttributeError:
                pass


def shuffle_partitions(requested: int | None = None) -> int:
    """Pick a hash-shuffle partition count sized to the cluster.

    Hash-shuffle spawns one aggregator actor per partition wave; asking
    for many more partitions than CPUs just burns actor-startup time
    (and the library default deadlocks a small local cluster). Cap at
    ~1× cluster CPUs; honor smaller explicit requests."""
    import ray

    cpus = 8
    if ray.is_initialized():
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            pass
    cap = max(2, cpus)
    if requested is None:
        return cap
    return max(1, min(requested, cap))
