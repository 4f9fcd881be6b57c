#!/usr/bin/env python
"""Benchmark runner (driver contract + BASELINE.md protocol).

Default: one fresh Ray session (`num_cpus` from $RAY_GRAFT_CPUS, default 32)
over $GRAFT_SF_DIR (default /root/testdata/sf0.1); runs the headline flagship
KG pipeline over a synthesized pages corpus scaled to the sf plus a set of
representative queries, and prints ONE JSON line.

--scaling: runs the SAME job twice in fresh subprocesses at num_cpus=8 and
num_cpus=32 (the sandbox stand-in for N vs 4N nodes, SURVEY.md §4) and prints
one JSON line with both throughputs and the scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_QUERIES = [
    "q1_pricing_summary", "q3_top_orders", "events_hourly",
    "docs_token_counts", "docs_exact_dedup", "docs_minhash_pairs",
    "emb_knn_bruteforce",
    # round-2 operators
    "events_sessionize", "events_latest_per_user", "docs_top_terms",
    "parts_with_lineitems", "docs_chunks", "orders_global_rank",
    "events_user_heavy_hitters",
    # round-3 operators
    "docs_span_dedup", "part_attrs_melt", "emb_pca_top_component",
    "q15_top_supplier",
    # round-4 operators
    "docs_curation_funnel", "docs_gopher_rules", "docs_bpe_merges",
    "events_user_rolling_median", "emb_knn_lsh",
    # round-4 late additions (heaviest of the new audit family)
    "docs_ngram_novelty", "customer_rfm_segments", "orders_cdc_diff",
    # round-4 continuation (new operator families at their heaviest)
    "docs_winnow_pairs", "lineitem_star_flatten",
    "events_user_trailing_distinct", "media_phash_pairs",
    # round-4 final session (directed-graph / linkage / format families)
    "part_dag_levels", "events_user_scc", "part_name_resolution",
    "cust_supp_balance_band", "docs_trigram_search",
    "orders_avro_roundtrip",
    # round-4 closing batch (MSF / rules / curation-model / set-sim).
    # docs_jaccard_prefix_join is deliberately NOT here: its prefix
    # blocking is honest-but-weak on the synthetic 40-word vocabulary
    # (documented in the query) and goes quadratic at sf0.1 — the
    # oracle sweep covers its correctness at sf0.001/0.01.
    "part_graph_msf", "basket_lift_rules", "docs_nb_source_model",
    "docs_dsir_weights", "emb_mutual_nn", "events_tumbling_changelog",
]


def _consume(res) -> int:
    """Materialize a result enough to have really executed it."""
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_size=65536, batch_format="pyarrow"):
            n += b.num_rows
        return n
    if isinstance(res, pa.Table):
        return res.num_rows
    return len(res)


def run_once() -> dict:
    """Flagship e2e measured ``RAY_GRAFT_REPEATS`` times (default 3) in one
    warm Ray session; the HEADLINE value is the median wall, and all
    per-run walls plus a pre-Ray busy-loop host probe ride in the JSON so
    a host-interference artifact (BENCH_r03's uniform ~2.3× inflation)
    can never masquerade as a code regression (VERDICT r3 item #7)."""
    import ray

    repeats = max(1, int(os.environ.get("RAY_GRAFT_REPEATS", "3")))
    # host probe BEFORE ray.init: single-proc and NUM_CPUS-wide busy-loop
    # rates. On an idle host wide/narrow ≈ NUM_CPUS; under throttling or
    # a noisy neighbor it collapses — the interference fingerprint.
    cpu1 = _cpu_throughput(1, seconds=0.5)
    cpuN = _cpu_throughput(NUM_CPUS, seconds=0.5)

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from information_extraction_system_ray.context import tune_context
    from information_extraction_system_ray.pipelines.flagship import annotate, \
        build_graph
    from information_extraction_system_ray.queries import _n_pages, queries
    from information_extraction_system_ray.sources.pages import synth_pages

    tune_context()

    # warm: model training/loading + one untimed tiny pass (page cache, JIT)
    from refimpl.oracle import get_model
    get_model()
    _consume(annotate(synth_pages(64), num_parts=4))

    n_pages = _n_pages(SF_DIR)
    sf = n_pages / 4000 * 0.001  # pages corpus scales 4k/40k/400k with sf
    # KG grows with the corpus (r4 VERDICT #1): ~√pages entities with
    # Zipf frequencies, so the canonicalize/graph phases face a
    # corpus-proportional node/edge table, not the constant 104 nodes
    n_entities = max(95, int(round(n_pages ** 0.5)))

    from concurrent.futures import ThreadPoolExecutor

    def flagship_run() -> tuple:
        t0 = time.time()
        ann = annotate(synth_pages(n_pages, n_entities=n_entities),
                       num_parts=64,
                       concurrency=(max(2, NUM_CPUS * 3 // 4), NUM_CPUS),
                       batch_size=128,
                       n_entities=n_entities).materialize()
        t_ann = time.time()
        g = build_graph(ann, n_entities=n_entities)
        t_cc = time.time()
        # nodes and edges are independent DAGs over the same materialized
        # input: drive them concurrently (ray.get releases the GIL)
        with ThreadPoolExecutor(2) as ex:
            f_edges = ex.submit(_consume, g["edges"])
            f_nodes = ex.submit(_consume, g["nodes"])
            n_edges, n_nodes = f_edges.result(), f_nodes.result()
        t_end = time.time()
        ph = {"annotate": round(t_ann - t0, 3),
              "canonicalize": round(t_cc - t_ann, 3),
              "graph": round(t_end - t_cc, 3)}
        return t_end - t0, ph, n_nodes, n_edges

    runs = [flagship_run() for _ in range(repeats)]
    runs_by_wall = sorted(runs, key=lambda r: r[0])
    flagship_s, phases, n_nodes, n_edges = runs_by_wall[len(runs) // 2]

    q = queries()
    q_times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        _consume(q[name](SF_DIR))
        q_times[name] = round(time.time() - t0, 3)

    out = {
        "metric": "flagship_kg_e2e_sec",
        "value": round(flagship_s, 3),
        "unit": "sec",
        "queries": q_times,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "pages": n_pages,
        "pages_per_s": round(n_pages / flagship_s, 1),
        "phases": phases,
        "nodes": n_nodes,
        "edges": n_edges,
        "n_entities": n_entities,
        "flagship_runs_sec": [round(r[0], 3) for r in runs],
        "flagship_stat": f"median_of_{repeats}",
        "host_probe": {
            "cpu_rate_1proc": round(cpu1, 0),
            "cpu_rate_wide": round(cpuN, 0),
            "wide_over_narrow": round(cpuN / cpu1, 2) if cpu1 else None,
            "wide_procs": NUM_CPUS,
        },
    }
    ray.shutdown()
    return out


def _burn(seconds: float) -> int:
    t0 = time.time()
    x = 0
    while time.time() - t0 < seconds:
        x += 1
    return x


def _burn_mem(seconds: float) -> int:
    """Memory-STREAMING control: repeatedly reduce a 32 MB float64 array
    (far beyond L2), so N-wide procs contend for DRAM bandwidth the way
    real Arrow/numpy batch kernels do. The ALU busy loop alone
    under-reports contention: the late-r4 ds.stats() audit measured the
    fused annotate operator 1.75× slower PER CORE at 32-wide while the
    busy-loop ceiling said 0.84 (BASELINE.md)."""
    import numpy as np
    a = np.ones(4_000_000, dtype=np.float64)
    t0 = time.time()
    x = 0
    while time.time() - t0 < seconds:
        x += int(a.sum() > 0)
    return x


def _cpu_throughput(n_procs: int, seconds: float = 1.0,
                    kernel=_burn) -> float:
    """Aggregate kernel iterations/s over n_procs plain processes — the
    HARDWARE's own parallel capacity at that width, independent of Ray.
    On shared/virtualized hosts per-core throughput drops under full load,
    which caps ANY software's measurable 8→32 scaling efficiency."""
    from multiprocessing import Pool

    with Pool(n_procs) as p:
        res = p.map(kernel, [seconds] * n_procs)
    return sum(res) / seconds


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    eff = (lo["pages_per_s"] and
           round(hi["pages_per_s"] / (4 * lo["pages_per_s"]), 3))
    # hardware ceilings: what a PERFECTLY scaling program could show here.
    # Two controls — ALU busy loop (scheduler/turbo effects) and a 32 MB
    # streaming reduction (DRAM bandwidth, the binding constraint for real
    # Arrow/numpy batch work on this host per the BASELINE.md audit).
    cpu8 = _cpu_throughput(8)
    cpu32 = _cpu_throughput(32)
    hw_ceiling = round(cpu32 / (4 * cpu8), 3)
    mem8 = _cpu_throughput(8, kernel=_burn_mem)
    mem32 = _cpu_throughput(32, kernel=_burn_mem)
    mem_ceiling = round(mem32 / (4 * mem8), 3)
    return {
        "metric": "scaling_efficiency_8_to_32",
        "value": eff,
        "unit": "ratio",
        "pages_per_s_8": lo["pages_per_s"],
        "pages_per_s_32": hi["pages_per_s"],
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "phases": {"cpus8": lo["phases"], "cpus32": hi["phases"]},
        "hw_cpu_scaling_ceiling": hw_ceiling,
        "hw_mem_scaling_ceiling": mem_ceiling,
        "efficiency_vs_hw_ceiling": round(eff / hw_ceiling, 3)
        if hw_ceiling else None,
        "efficiency_vs_mem_ceiling": round(eff / mem_ceiling, 3)
        if mem_ceiling else None,
        "sf": lo["sf"],
        "queries": {"cpus8": lo["queries"], "cpus32": hi["queries"]},
    }


if __name__ == "__main__":
    os.environ.setdefault("RAY_DATA_DISABLE_PROGRESS_BARS", "1")
    result = run_scaling() if "--scaling" in sys.argv else run_once()
    print(json.dumps(result))
