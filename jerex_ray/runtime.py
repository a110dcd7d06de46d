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
    # cpus//4 measured fastest end-to-end on this build (round-5
    # sweep at sf0.1/32: 8 partitions beat 16 by ~0.3 s and 24+ by
    # >0.8 s on the flagship): aggregator actor startup scales with
    # partition count and outweighs the extra parallelism well below
    # the core count. Downstream actor parallelism is NOT bound by
    # this (blocks re-split to DOCS_PER_BLOCK rows after the
    # shuffle); large corpora should pass an explicit count sized to
    # partition-memory bounds.
    cap = max(2, cpus // 4)
    if requested is None:
        return cap
    # explicit requests are clamped to cpus//2 — the aggregator-fleet
    # bound that two rounds of testing established as deadlock-safe
    # (each shuffle partition is an aggregator actor competing with
    # the map tasks for CPUs; at 4 test CPUs an 8-partition request
    # starves the cluster). Only the AUTO default moved to cpus//4
    # for latency; callers needing more partitions for per-partition
    # memory at scale get up to half the cluster, and the combiner
    # aggregates bound memory independently of partition count.
    return max(1, min(requested, max(2, cpus // 2)))


def pool_concurrency(actor_num_cpus: float = 1.0,
                     cpu_fraction: float = 0.5) -> tuple[int, int]:
    """Fixed-size actor-pool bounds: ``cpu_fraction`` of the cluster.

    Fixed (min == max) on purpose: the autoscaling pool's ramp-up was
    measured to cost ~2× wall time on pipeline-length jobs (the pool
    never reaches cluster width before the stage drains). Fractions are
    chosen so tokenizer (0.25) + scorer (0.5) + shuffle aggregators +
    tasks fit the cluster without starving any stage."""
    import ray

    cpus = 8
    if ray.is_initialized():
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            pass
    n = max(2, int(cpus * cpu_fraction / max(actor_num_cpus, 0.25)))
    # min = half fleet: near-instant baseline throughput without the
    # full-fleet creation barrier (which can deadlock a tiny cluster
    # when several pools + shuffle aggregators start simultaneously)
    return (max(1, n // 2), n)


def read_parquet_sized(path: str, *, columns=None, filter=None,
                       target_block_bytes: int = 8 * 1024 * 1024):
    """``read_parquet`` with block count matched to the input size.

    Ray's default splits small files into per-CPU slivers (64 blocks of
    5k rows for a 10 MB table), and per-task + per-shuffle-block
    overhead then dominates wall time. Sizing blocks to ~8 MB of file
    bytes keeps tasks meaningful at every scale: a 10 MB table becomes
    1-2 blocks, a 1 TB table becomes ~128k blocks streamed normally."""
    import os

    import ray.data as rd

    configure_data_context()
    try:
        size = (sum(os.path.getsize(p) for p in path)
                if isinstance(path, (list, tuple))
                else os.path.getsize(path))
    except OSError:
        size = None
    kwargs = {}
    if size is not None:
        nblocks = max(1, min(shuffle_partitions() * 4,
                             size // target_block_bytes + 1))
        kwargs["override_num_blocks"] = int(nblocks)
    if columns is not None:
        kwargs["columns"] = columns
    if filter is not None:
        kwargs["filter"] = filter
    return rd.read_parquet(path, **kwargs)
