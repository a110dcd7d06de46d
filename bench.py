"""Benchmark harness (driver contract).

Default: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ..., "num_cpus": N}``.

``--scaling``: runs the headline KG pipeline twice in fresh processes
at num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs + scaling efficiency (the sandbox substitute for N vs 4N
cluster nodes, per BASELINE.md).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# queries() entries timed for the headline number (a representative mix:
# the KG flagship, a dedup, a vector op, and the relational core)
BENCH_QUERIES = [
    "kg_triples",
    "kg_triples_numpy",
    "doc_exact_dedup",
    "dedup_minhash_edges",
    "ann_topk",
    "q1_pricing_summary",
    "q_top_customer_revenue",
    "q_events_hourly",
]


def _sf_value(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.0


def run_bench() -> dict:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from jerex_ray.pipelines.queries import build_queries
    from jerex_ray.runtime import configure_data_context
    configure_data_context()

    qs = build_queries()

    # warm the OS page cache: one untimed pass over the parquet inputs
    for t in ("lineitem", "orders", "customer", "documents", "embeddings",
              "events"):
        with open(f"{SF_DIR}/{t}.parquet", "rb") as f:
            while f.read(1 << 24):
                pass

    repeats = max(1, int(os.environ.get("GRAFT_BENCH_REPEATS", "3")))
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = None
        for _ in range(repeats):       # min-of-N: the shared host adds
            t0 = time.perf_counter()   # ±30-80% run-to-run noise
            result = qs[name](SF_DIR)
            # force full materialization of lazy results
            if hasattr(result, "to_pandas"):
                result = result.to_pandas()
            _ = len(result)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_pipeline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_value(SF_DIR),
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return out


SCALING_CONVS = int(os.environ.get("GRAFT_SCALING_CONVS", "240000"))


def _pin_enabled() -> bool:
    import shutil
    return (shutil.which("taskset") is not None
            and os.environ.get("GRAFT_PIN_CPUS", "1") != "0")


def _pinned_cmd(ncpu: int, pin: bool) -> list[str]:
    """``taskset`` prefix confining a child to ``ncpu`` CPUs — chosen
    from THIS process's actual affinity set (CPU ids need not start at
    0 inside a cgroup cpuset); falls back to unpinned when fewer than
    ``ncpu`` CPUs are available rather than crashing the bench."""
    if not pin:
        return []
    try:
        avail = sorted(os.sched_getaffinity(0))
    except (AttributeError, OSError):
        return []
    if len(avail) < ncpu:
        return []
    ids = ",".join(str(c) for c in avail[:ncpu])
    return ["taskset", "-c", ids]


def run_scaling_child() -> dict:
    """One scaling measurement: the flagship KG extraction over a fixed
    synthetic transcript corpus large enough that model compute (not
    fixed session/shuffle overhead) dominates — the honest regime for
    a throughput-scaling claim."""
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from jerex_ray.config import PipelineConfig
    from jerex_ray.pipelines.kg import extract_triples
    from jerex_ray.runtime import configure_data_context
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    configure_data_context()

    # fixed-size pools sized to the cluster: an autoscaling pool's
    # ramp-up eats a large fraction of a short run; a real cluster job
    # provisions its actor fleet once up front
    cfg = PipelineConfig(num_output_partitions=8)

    def run_once(n_convs: int) -> tuple[int, float]:
        ds = read_synthetic_transcripts(n_convs)
        t0 = time.perf_counter()
        # distributed count: full pipeline executes, only a number
        # reaches the driver (single-threaded driver pull would be a
        # serial tail that biases the high-CPU measurement)
        n = extract_triples(ds, cfg).count()
        return n, time.perf_counter() - t0

    # untimed warmup: spin up the full worker/actor fleet + page cache
    run_once(3000)
    n_triples, dt = run_once(SCALING_CONVS)

    # honest resource accounting for the dress-rehearsal regime:
    # driver peak RSS, cluster-wide object-store usage and spill
    # volume (from Ray's own memory summary)
    import resource
    rss_mib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    spilled_mib = obj_store_mib = 0
    try:
        from ray._private.internal_api import memory_summary
        summ = memory_summary(stats_only=True)
        m = re.search(r"Spilled (\d+) MiB", summ)
        spilled_mib = int(m.group(1)) if m else 0
        m = re.search(r"Plasma memory usage (\d+) MiB", summ)
        obj_store_mib = int(m.group(1)) if m else 0
    except Exception:
        pass
    ray.shutdown()
    return {"metric": "kg_extraction_sec", "value": round(dt, 3),
            "unit": "sec", "n_convs": SCALING_CONVS,
            "n_triples": n_triples,
            "triples_per_sec": round(n_triples / dt, 1),
            "num_cpus": NUM_CPUS,
            "driver_peak_rss_mib": rss_mib,
            "object_store_mib": obj_store_mib,
            "spilled_mib": spilled_mib}


def run_scaling() -> dict:
    """Same flagship job at 8 and 32 CPUs in fresh processes — the
    sandbox substitute for N vs 4N cluster nodes (BASELINE.md).

    Each leg is pinned with OS-enforced CPU affinity (``taskset``
    over the first N CPUs of this process's affinity set, inherited
    by every Ray worker the child spawns) so the "8-CPU" process
    cannot overdraw its quarter of the machine — without the pin,
    Ray's logical CPU accounting is not OS-enforced and the low leg
    runs faster than a real 8-core node would, understating
    efficiency. Set GRAFT_PIN_CPUS=0 to disable."""
    pin = _pin_enabled()

    def run_one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        cmd = _pinned_cmd(ncpu, pin) + [
            sys.executable, os.path.abspath(__file__),
            "--scaling-child"]
        proc = subprocess.run(cmd, env=env, capture_output=True,
                              text=True, check=True)
        return json.loads(proc.stdout.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # min of 2: the sandbox shares a host; single runs vary ±30%
        a, b = run_one(ncpu), run_one(ncpu)
        return a if a["value"] <= b["value"] else b

    lo, hi = run(8), run(32)
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (32 / 8) if t_hi > 0 else 0.0
    return {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "job": "kg_extraction",
        "n_convs": lo["n_convs"],
        "sec_8": t_lo,
        "sec_32": t_hi,
        "triples_per_sec_8": lo["triples_per_sec"],
        "triples_per_sec_32": hi["triples_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "cpu_affinity_pinned": pin,
    }


def run_stats() -> dict:
    """Per-operator wall/remote-time breakdown of the flagship KG
    extraction (``ds.stats()``) — the measure-don't-guess loop: run
    after any stage change and check that wall time stays dominated by
    the scorer's useful compute, not shuffle or assembly overhead."""
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from jerex_ray.config import PipelineConfig
    from jerex_ray.pipelines.kg import extract_triples
    from jerex_ray.runtime import configure_data_context
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    configure_data_context()
    n_convs = int(os.environ.get("GRAFT_STATS_CONVS", "8000"))
    t0 = time.perf_counter()
    mat = extract_triples(read_synthetic_transcripts(n_convs),
                          PipelineConfig()).materialize()
    wall = time.perf_counter() - t0
    ops: list[dict] = []
    # parse the human-readable stats into (operator, pipeline-seconds,
    # total-remote-seconds) rows
    op_re = re.compile(r"^Operator \d+ (.+?): .*?in ([0-9.]+)s")
    rw_re = re.compile(r"Remote wall time:.* ([0-9.]+(?:us|ms|s)) total")
    unit = {"us": 1e-6, "ms": 1e-3, "s": 1.0}
    for line in mat.stats().splitlines():
        m = op_re.match(line.strip())
        if m:
            ops.append({"operator": m.group(1)[:70],
                        "pipeline_sec": float(m.group(2))})
        else:
            m = rw_re.search(line)
            if m and ops and "remote_sec" not in ops[-1]:
                v = m.group(1)
                suffix = "us" if v.endswith("us") else (
                    "ms" if v.endswith("ms") else "s")
                ops[-1]["remote_sec"] = round(
                    float(v[:-len(suffix)]) * unit[suffix], 3)
    ray.shutdown()
    return {"metric": "kg_extraction_stage_stats", "wall_sec": round(wall, 3),
            "n_convs": n_convs, "num_cpus": NUM_CPUS, "operators": ops}


def run_rehearsal() -> dict:
    """100×-proxy dress rehearsal (round-4 item 5): ONE recorded run
    of the flagship at the largest corpus that fits (default 2.4M
    convs ≈ 21M turns) at 8 and 32 CPUs in fresh processes — wall,
    triples/s, driver peak RSS, object-store/spill volume, and the
    8→32 efficiency at that size. Single runs (no min-of-N): at this
    job length fixed overhead is amortized and the noise share small."""
    n = int(os.environ.get("GRAFT_REHEARSAL_CONVS", "2400000"))
    pin = _pin_enabled()

    def run_one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_SCALING_CONVS=str(n))
        # OS-enforced affinity: see run_scaling
        cmd = _pinned_cmd(ncpu, pin) + [
            sys.executable, os.path.abspath(__file__),
            "--scaling-child"]
        proc = subprocess.run(cmd, env=env, capture_output=True,
                              text=True, check=True)
        return json.loads(proc.stdout.strip().splitlines()[-1])

    lo, hi = run_one(8), run_one(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8) if hi["value"] else 0.0
    return {
        "metric": "dress_rehearsal_2p4M_convs",
        "cpu_affinity_pinned": pin,
        "n_convs": n,
        "n_triples": hi["n_triples"],
        "sec_8": lo["value"], "sec_32": hi["value"],
        "triples_per_sec_8": lo["triples_per_sec"],
        "triples_per_sec_32": hi["triples_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "driver_peak_rss_mib_32": hi["driver_peak_rss_mib"],
        "object_store_mib_32": hi["object_store_mib"],
        "spilled_mib_32": hi["spilled_mib"],
    }


if __name__ == "__main__":
    if "--scaling-child" in sys.argv:
        print(json.dumps(run_scaling_child()))
    elif "--rehearsal" in sys.argv:
        print(json.dumps(run_rehearsal()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--stats" in sys.argv:
        print(json.dumps(run_stats(), indent=1))
    else:
        print(json.dumps(run_bench()))
