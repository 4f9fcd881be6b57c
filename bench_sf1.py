"""sf1 (4M pages) flagship + scaling evidence (VERDICT r2 next-#5; r3
next-#10 adds the forced-Pregel graph phase).

Runs the flagship KG pipeline over a deterministically synthesized 4M-page
corpus (10× the sf0.1 bench) at two parallelism levels in FRESH subprocess
Ray sessions (the sandbox stand-in for the north rule's N vs 4N cluster
sizes), and writes BENCH_r4_sf1.json with per-phase walls, throughputs and
the 8→32 efficiency. The 32-CPU child additionally re-runs the graph phase
with ``driver_threshold=0`` so the ARCHIVED numbers exercise the Pregel
shard-actor connected-components path, not just the driver union-find fast
path (``graph_distributed``). The busy-loop hardware ceiling is measured in
the same run so the ratio is interpretable on this throttling virtualized
host (BASELINE.md protocol)."""

import json
import subprocess
import sys
import time

N_PAGES = 4_000_000

_CHILD = r"""
import json, sys, time
NUM_CPUS = int(sys.argv[1]); N_PAGES = int(sys.argv[2])
import ray
ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
         logging_level="ERROR")
import logging; logging.getLogger("ray.data").setLevel(logging.ERROR)
from information_extraction_system_ray.context import tune_context
from information_extraction_system_ray.pipelines.flagship import (
    annotate, build_graph)
from information_extraction_system_ray.sources.pages import synth_pages
from refimpl.oracle import get_model

tune_context(); get_model()

def consume(ds):
    n = 0
    for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        n += b.num_rows
    return n

consume(annotate(synth_pages(64), num_parts=4))  # warm
N_ENT = max(95, int(round(N_PAGES ** 0.5)))  # KG grows with corpus (r5)
t0 = time.time()
ann = annotate(synth_pages(N_PAGES, n_entities=N_ENT), num_parts=256,
               concurrency=(max(2, NUM_CPUS * 3 // 4), NUM_CPUS),
               batch_size=128, n_entities=N_ENT).materialize()
t1 = time.time()
g = build_graph(ann, n_entities=N_ENT)
t2 = time.time()
from concurrent.futures import ThreadPoolExecutor
with ThreadPoolExecutor(2) as ex:
    fe = ex.submit(consume, g["edges"]); fn = ex.submit(consume, g["nodes"])
    n_edges, n_nodes = fe.result(), fn.result()
t3 = time.time()
out = {"num_cpus": NUM_CPUS, "pages": N_PAGES,
       "wall_s": round(t3 - t0, 3),
       "pages_per_s": round(N_PAGES / (t3 - t0), 1),
       "phases": {"annotate": round(t1 - t0, 3),
                  "canonicalize": round(t2 - t1, 3),
                  "graph": round(t3 - t2, 3)},
       "nodes": n_nodes, "edges": n_edges, "n_entities": N_ENT}
if len(sys.argv) > 3 and sys.argv[3] == "distributed":
    # force the Pregel shard-actor CC (driver_threshold=0) over the same
    # materialized annotations — the archived evidence that the
    # distributed graph path holds at sf1 (VERDICT r3 item #10)
    t4 = time.time()
    g2 = build_graph(ann, driver_threshold=0, n_entities=N_ENT)
    with ThreadPoolExecutor(2) as ex:
        fe = ex.submit(consume, g2["edges"])
        fn = ex.submit(consume, g2["nodes"])
        d_edges, d_nodes = fe.result(), fn.result()
    t5 = time.time()
    out["graph_distributed"] = {
        "wall_s": round(t5 - t4, 3), "driver_threshold": 0,
        "nodes": d_nodes, "edges": d_edges,
        "parity_with_driver_uf": (d_nodes, d_edges) == (n_nodes, n_edges)}
    # r4 VERDICT #5: dedup-suite evidence at sf1 — exact + MinHash+LSH
    # over a 4M-doc corpus (the stripped page texts), walls + peak
    # driver RSS (proof nothing corpus-sized lands on the driver)
    import resource
    import pyarrow as pa
    from information_extraction_system_ray.functions.dedup import (
        exact_dedup, minhash_lsh_duplicates)
    from information_extraction_system_ray.functions.hashing import \
        stable_hash64
    from information_extraction_system_ray.stages.strip import extract_text

    def as_docs(t: pa.Table) -> pa.Table:
        import numpy as _np
        ids = _np.fromiter((stable_hash64(u) for u in
                            t["url"].to_pylist()), _np.int64, len(t))
        return pa.table({"doc_id": pa.array(ids), "text": t["text"]})

    docs = (extract_text(synth_pages(N_PAGES, n_entities=N_ENT),
                         num_parts=256, with_sha=False)
            .map_batches(as_docs, batch_format="pyarrow").materialize())
    t6 = time.time()
    n_exact = exact_dedup(docs).count()
    t7 = time.time()
    n_near = minhash_lsh_duplicates(docs).count()
    t8 = time.time()
    out["dedup_sf1"] = {
        "n_docs": docs.count(),
        "docs_materialize_s": round(t6 - t5, 3),
        "exact_dedup_survivors": n_exact,
        "exact_dedup_s": round(t7 - t6, 3),
        "minhash_lsh_dup_rows": n_near,
        "minhash_lsh_s": round(t8 - t7, 3),
        "driver_peak_rss_mb": resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss // 1024}
ray.shutdown()
print("SF1RESULT " + json.dumps(out))
"""

_CEILING = r"""
import json, sys, time
from multiprocessing import Pool

def spin(n):
    x = 0
    for i in range(n):
        x += i * i
    return x

def mps(workers, per=12, n=4_000_000):
    with Pool(workers) as p:
        t0 = time.time()
        p.map(spin, [n] * (workers * per))
        return workers * per / (time.time() - t0)

lo, hi = mps(8), mps(32)
print("CEIL " + json.dumps({"ceiling": round(hi / (4 * lo), 3)}))
"""


def run_child(code: str, *args: str) -> dict:
    p = subprocess.run([sys.executable, "-c", code, *args],
                       capture_output=True, text=True, timeout=5400)
    for line in p.stdout.splitlines():
        if line.startswith(("SF1RESULT ", "CEIL ")):
            return json.loads(line.split(" ", 1)[1])
    raise RuntimeError(f"child failed: {p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    t_start = time.time()
    lo = run_child(_CHILD, "8", str(N_PAGES))
    hi = run_child(_CHILD, "32", str(N_PAGES), "distributed")
    ceil = run_child(_CEILING)
    eff = round(hi["pages_per_s"] / (4 * lo["pages_per_s"]), 3)
    out = {
        "metric": "flagship_kg_sf1_scaling",
        "sf": 1.0, "pages": N_PAGES,
        "cpus8": lo, "cpus32": hi,
        "scaling_efficiency_8_to_32": eff,
        "hw_cpu_scaling_ceiling": ceil["ceiling"],
        "efficiency_vs_ceiling": round(eff / ceil["ceiling"], 3),
        "total_runtime_s": round(time.time() - t_start, 1),
    }
    with open("BENCH_r05_sf1.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
