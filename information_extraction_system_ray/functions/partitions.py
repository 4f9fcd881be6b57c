"""Cluster-size-derived shuffle partition counts.

Every hash-partitioned operator in this repo (window, asof, range join,
semi/anti join, dedup pair buckets, graph merge) takes a
``num_partitions``; a fixed constant is right for a 32-CPU test node but
starves a 256-node cluster (too few reducers) or drowns a laptop in tiny
tasks (too many). ``default_parts()`` resolves the count LAZILY at operator
call time from the live cluster: ~1 hash partition per CPU, floored so
small clusters still get enough parallelism to overlap stages, capped so a
driver-side per-partition merge never sees an absurd task count.

Callers that pass an explicit ``num_partitions`` are untouched — all
outputs are partition-count invariant (property-tested), so this is purely
a physical-plan knob.
"""

from __future__ import annotations


def default_parts(min_parts: int = 16, per_cpu: float = 1.0,
                  max_parts: int = 2048) -> int:
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 0)) \
            if ray.is_initialized() else 0
    except Exception:
        cpus = 0
    return max(min_parts, min(max_parts, int(cpus * per_cpu)))
