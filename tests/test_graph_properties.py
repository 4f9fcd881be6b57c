"""Property tests for graph materialization: the partial+merge edge build
must be independent of how rows are split into blocks (the associativity
claim the 100 TB design rests on)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _gold_edges(df: pd.DataFrame) -> pd.DataFrame:
    """Single-process ground truth: counts + min-5 distinct urls per key."""
    g = (df.groupby(["subj_id", "pred", "obj_id"], sort=True)
         .agg(n_support=("url", "size"),
              sample_urls=("url", lambda s: sorted(set(s))[:5]))
         .reset_index())
    return g


@pytest.mark.parametrize("n_blocks", [1, 3, 17])
def test_build_edges_block_split_invariant(ray_session, n_blocks):
    import ray
    import ray.data as rd

    from information_extraction_system_ray.stages.graph import build_edges
    from information_extraction_system_ray.stages.triple_extract import TRIPLE_TYPE

    rng = np.random.default_rng(7 + n_blocks)
    n_pages = 120
    rows_url, rows_triples = [], []
    subj_pool = [f"E{i}" for i in range(6)]
    pred_pool = ["founded", "acquired", "located_in"]
    for i in range(n_pages):
        url = f"https://x.example/p{i}"
        trs = []
        for _ in range(int(rng.integers(0, 6))):
            t = {f.name: None for f in TRIPLE_TYPE}
            t.update({
                "subj": "s", "pred": str(rng.choice(pred_pool)),
                "obj": "o", "subj_start": 0, "subj_end": 1,
                "obj_start": 2, "obj_end": 3,
                "subj_entity_id": str(rng.choice(subj_pool)),
                "obj_entity_id": str(rng.choice(subj_pool)),
                "conf": 1.0,
            })
            trs.append(t)
        rows_url.append(url)
        rows_triples.append(trs)

    ann = pa.table({
        "url": pa.array(rows_url, pa.string()),
        "mentions": pa.array([[]] * n_pages, pa.list_(pa.struct(
            [("start", pa.int32()), ("end", pa.int32()),
             ("surface", pa.string()), ("label", pa.string()),
             ("entity_id", pa.string()), ("link_score", pa.float64())]))),
        "triples": pa.array(rows_triples, pa.list_(TRIPLE_TYPE)),
    })
    ds = rd.from_arrow(ann).repartition(n_blocks)
    cref = ray.put({})  # identity cluster map
    got = build_edges(ds, cref).to_pandas()
    got["sample_urls"] = got["sample_urls"].map(list)

    flat = []
    for url, trs in zip(rows_url, rows_triples):
        for t in trs:
            flat.append({"subj_id": t["subj_entity_id"], "pred": t["pred"],
                         "obj_id": t["obj_entity_id"], "url": url})
    want = _gold_edges(pd.DataFrame(flat))
    got = got.sort_values(["subj_id", "pred", "obj_id"]) \
        .reset_index(drop=True)
    want = want.sort_values(["subj_id", "pred", "obj_id"]) \
        .reset_index(drop=True)
    assert got.to_dict("records") == want.to_dict("records")


def test_triangle_count_known_graphs(ray_session):
    """K4 has 4 triangles; a star hub has 0; brute force agrees on a
    random graph regardless of block layout."""
    import itertools
    import random

    import ray.data as rd
    from information_extraction_system_ray.functions.graphops import (
        triangle_count)

    def run(edges, nparts=3):
        t = pa.table({"u": pa.array([a for a, _ in edges], pa.int64()),
                      "v": pa.array([b for _, b in edges], pa.int64())})
        ds = rd.from_arrow(t).repartition(nparts)
        return triangle_count(ds, u="u", v="v").take_all()[0]["triangles"]

    k4 = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    assert run(k4) == 4

    star = [(0, i) for i in range(1, 30)]          # hub, no closure
    assert run(star) == 0

    rng = random.Random(7)
    nodes = list(range(40))
    rand = sorted({tuple(sorted(rng.sample(nodes, 2)))
                   for _ in range(220)})
    eset = set(rand)
    brute = sum(1 for a, b, c in itertools.combinations(nodes, 3)
                if (a, b) in eset and (b, c) in eset and (a, c) in eset)
    assert run(rand, nparts=5) == brute
    assert run(rand, nparts=1) == brute


def test_kcore_matches_brute_force_peeling(ray_session):
    """Distributed k-core equals driver-side peeling on K5 (3-core = K5),
    a star (2-core empty), a lollipop (clique survives, tail peels), and
    a random graph — on any block layout."""
    import itertools
    import random

    import ray.data as rd
    from information_extraction_system_ray.functions.graphops import kcore

    def brute(edges, k):
        es = set(edges)
        while True:
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            low = {n for n, d in deg.items() if d < k}
            if not low:
                return es
            es = {(a, b) for a, b in es
                  if a not in low and b not in low}
            if not es:
                return es

    def run(edges, k, nparts=4, bt=2_000_000):
        t = pa.table({"u": pa.array([a for a, _ in edges], pa.int64()),
                      "v": pa.array([b for _, b in edges], pa.int64())})
        core = kcore(rd.from_arrow(t).repartition(nparts), k=k,
                     broadcast_threshold=bt)
        return {(r["u"], r["v"]) for r in core.take_all()}

    k5 = [(a, b) for a, b in itertools.combinations(range(5), 2)]
    assert run(k5, 3) == set(k5)                 # K5 is its own 3-core

    star = [(0, i) for i in range(1, 20)]
    assert run(star, 2) == set()                 # star has no 2-core

    lollipop = k5 + [(4, 10), (10, 11), (11, 12)]
    assert run(lollipop, 3) == set(k5)           # tail peels away

    rng = random.Random(13)
    nodes = list(range(30))
    rand = sorted({tuple(sorted(rng.sample(nodes, 2)))
                   for _ in range(120)})
    for k in (2, 3, 4):
        assert run(rand, k) == brute(rand, k)
    assert run(rand, 3, nparts=1) == brute(rand, 3)
    # bt=0 forces the co-partitioned shuffle path end-to-end
    assert run(rand, 3, bt=0) == brute(rand, 3)
    assert run(lollipop, 3, bt=0) == set(k5)


def test_bfs_matches_brute_force(ray_session):
    """Distributed level-synchronous BFS equals driver BFS on a path
    (deep — exercises many rounds), a star, and a random graph with an
    unreachable island; layout-invariant."""
    import collections
    import random

    import ray.data as rd
    from information_extraction_system_ray.functions.graphops import \
        bfs_distances

    def brute(edges, src, cap=50):
        adj = collections.defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        dist = {src: 0}
        q = collections.deque([src])
        while q:
            n = q.popleft()
            if dist[n] >= cap:
                continue
            for m in adj[n]:
                if m not in dist:
                    dist[m] = dist[n] + 1
                    q.append(m)
        return dist

    def run(edges, src, nparts=4, cap=50):
        t = pa.table({"u": pa.array([a for a, _ in edges], pa.int64()),
                      "v": pa.array([b for _, b in edges], pa.int64())})
        out = bfs_distances(rd.from_arrow(t).repartition(nparts),
                            source=src, max_iters=cap)
        return {r["node"]: r["dist"] for r in out.take_all()}

    path = [(i, i + 1) for i in range(12)]
    assert run(path, 0) == brute(path, 0)
    assert run(path, 0, cap=5) == brute(path, 0, cap=5)  # truncation law

    star = [(0, i) for i in range(1, 15)]
    assert run(star, 0) == brute(star, 0)

    rng = random.Random(7)
    nodes = list(range(25))
    rand = sorted({tuple(sorted(rng.sample(nodes, 2)))
                   for _ in range(60)})
    rand += [(100, 101), (101, 102)]  # island: unreachable from min node
    src = min(n for e in rand for n in e)
    assert run(rand, src) == brute(rand, src)
    assert run(rand, src, nparts=1) == brute(rand, src)


def test_sssp_matches_dijkstra(ray_session):
    """Pregel min-plus SSSP (stages/pregel.py mode="sssp") equals a
    pure-Python heapq Dijkstra on a weighted path, a shortcut graph
    where the hop-shortest route is NOT the cost-shortest one, parallel
    edges (min weight must win), and a random weighted graph with an
    unreachable island; layout-invariant."""
    import heapq
    import random

    import ray.data as rd
    from information_extraction_system_ray.stages.pregel import \
        run_propagation

    def dijkstra(edges, src):
        adj = {}
        for a, b, w in edges:
            adj.setdefault(a, []).append((b, w))
            adj.setdefault(b, []).append((a, w))
        dist, heap = {}, [(0, src)]
        while heap:
            d, n = heapq.heappop(heap)
            if n in dist:
                continue
            dist[n] = d
            for m, w in adj.get(n, []):
                if m not in dist:
                    heapq.heappush(heap, (d + w, m))
        return dist

    def run(edges, src, nparts=4):
        t = pa.table({"u": pa.array([a for a, _, _ in edges], pa.int64()),
                      "v": pa.array([b for _, b, _ in edges], pa.int64()),
                      "w": pa.array([w for _, _, w in edges], pa.int64())})
        out = run_propagation(rd.from_arrow(t).repartition(nparts),
                              mode="sssp", src_col="u", dst_col="v",
                              weight_col="w", source=src,
                              num_partitions=3, max_rounds=200)
        return {r["node"]: r["dist"] for r in out.take_all()}

    path = [(i, i + 1, 2 + (i % 3)) for i in range(10)]
    assert run(path, 0) == dijkstra(path, 0)

    # hop-shortest (0-9 direct, cost 100) loses to the 9-hop rim
    ring = [(i, i + 1, 1) for i in range(9)] + [(0, 9, 100)]
    got = run(ring, 0)
    assert got == dijkstra(ring, 0)
    assert got[9] == 9  # not 100: weighted, not hop, distance

    # parallel edges: the cheaper duplicate must win
    par = [(0, 1, 10), (0, 1, 3), (1, 2, 1)]
    assert run(par, 0) == {0: 0, 1: 3, 2: 4}

    rng = random.Random(13)
    nodes = list(range(30))
    rand = sorted({tuple(sorted(rng.sample(nodes, 2)))
                   for _ in range(70)})
    rand = [(a, b, 1 + rng.randrange(9)) for a, b in rand]
    rand += [(200, 201, 5)]  # unreachable island
    src = min(n for e in rand for n in e[:2])
    want = dijkstra(rand, src)
    assert run(rand, src) == want
    assert run(rand, src, nparts=1) == want


def test_ktruss_matches_brute_force_peeling(ray_session):
    """edge_supports == per-edge brute triangle counts, and ktruss ==
    pure-Python peeling, on K5, K4+pendant-chain, and a random graph;
    layout-invariant; k larger than any truss → empty."""
    import itertools
    import random

    import ray.data as rd
    from information_extraction_system_ray.functions.graphops import \
        edge_supports, ktruss

    def brute_supports(edges):
        es = set(edges)
        nbrs = {}
        for a, b in es:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        return {(a, b): len(nbrs[a] & nbrs[b]) for a, b in es}

    def brute_truss(edges, k):
        cur = set(edges)
        while True:
            sup = brute_supports(sorted(cur))
            drop = {e for e, s in sup.items() if s < k - 2}
            if not drop:
                return cur
            cur -= drop

    def ds_of(edges, nparts=3):
        return rd.from_arrow(pa.table({
            "u": pa.array([a for a, _ in edges], pa.int64()),
            "v": pa.array([b for _, b in edges], pa.int64())})
        ).repartition(nparts)

    def run_sup(edges):
        out = edge_supports(ds_of(edges), num_partitions=3)
        return {(r["u"], r["v"]): r["support"] for r in out.take_all()}

    def run_truss(edges, k, nparts=3):
        out = ktruss(ds_of(edges, nparts), k=k, num_partitions=3)
        return {(r["u"], r["v"]) for r in out.take_all()}

    k5 = list(itertools.combinations(range(5), 2))
    assert run_sup(k5) == brute_supports(k5)
    assert run_truss(k5, 5) == set(k5)
    assert run_truss(k5, 6) == set()

    # K4 + pendant chain: the chain must peel away, the clique survive
    k4chain = list(itertools.combinations(range(4), 2)) + \
        [(3, 10), (10, 11), (11, 12)]
    assert run_sup(k4chain) == brute_supports(k4chain)
    assert run_truss(k4chain, 4) == set(itertools.combinations(range(4), 2))

    rng = random.Random(5)
    nodes = list(range(25))
    rand = sorted({tuple(sorted(rng.sample(nodes, 2)))
                   for _ in range(120)})
    assert run_sup(rand) == brute_supports(rand)
    for k in (3, 4, 5):
        want = brute_truss(rand, k)
        assert run_truss(rand, k) == want
        assert run_truss(rand, k, nparts=1) == want


def test_dag_longest_paths_matches_brute_force(ray_session):
    """Pregel directed max-plus (stages/pregel.py mode="longest") equals
    a pure-Python topological DP on a chain, a diamond with a shortcut
    (the LONGER route must win), and a random u<v DAG; layout-invariant;
    a cyclic input raises (cycle detection contract)."""
    import random

    import pytest
    import ray.data as rd
    from information_extraction_system_ray.functions.graphops import \
        dag_longest_paths

    def brute(edges):
        nodes = sorted({n for e in edges for n in e})
        level = {n: 0 for n in nodes}
        for _ in nodes:                       # |V| relaxation sweeps
            for a, b in edges:
                level[b] = max(level[b], level[a] + 1)
        return level

    def run(edges, nparts=4):
        t = pa.table({"u": pa.array([a for a, _ in edges], pa.int64()),
                      "v": pa.array([b for _, b in edges], pa.int64())})
        out = dag_longest_paths(rd.from_arrow(t).repartition(nparts),
                                num_partitions=3)
        return {r["node"]: r["level"] for r in out.take_all()}

    chain = [(i, i + 1) for i in range(12)]
    assert run(chain) == brute(chain)

    # diamond + direct shortcut: 0→5 direct must still sit at the
    # longest-route level, not the 1-hop one
    diamond = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 5)]
    got = run(diamond)
    assert got == brute(diamond)
    assert got[5] == 5

    rng = random.Random(7)
    nodes = list(range(40))
    rand = sorted({tuple(sorted(rng.sample(nodes, 2)))
                   for _ in range(120)})      # u<v ⇒ acyclic
    want = brute(rand)
    assert run(rand) == want
    assert run(rand, nparts=1) == want

    with pytest.raises(RuntimeError):
        run([(0, 1), (1, 2), (2, 0)])         # 3-cycle never converges


def test_random_walks_matches_replay(ray_session):
    """random_walks == a pure-pandas sequential replay of the same
    hash rule (sorted_neighbors[h(seed,start,step,cur) % deg]) on a
    path, a star, and a random graph; layout-invariant; every walk has
    exactly walk_len steps and every hop is a real edge."""
    import random

    import ray.data as rd
    from information_extraction_system_ray.functions.graphops import \
        random_walks

    def replay(edges, walk_len, seed=7):
        nbrs = {}
        for a, b in edges:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        nbrs = {k: sorted(vs) for k, vs in nbrs.items()}
        out = {}
        for start in nbrs:
            cur, path = start, str(start)
            for step in range(walk_len):
                ns = nbrs[cur]
                h = int(pd.util.hash_pandas_object(
                    pd.Series([f"{seed}:{start}:{step}:{cur}"]),
                    index=False).iloc[0])
                cur = ns[h % len(ns)]
                path += f">{cur}"
            out[start] = path
        return out

    def run(edges, walk_len=4, nparts=3):
        t = pa.table({"u": pa.array([a for a, _ in edges], pa.int64()),
                      "v": pa.array([b for _, b in edges], pa.int64())})
        out = random_walks(rd.from_arrow(t).repartition(nparts),
                           walk_len=walk_len, num_partitions=3)
        return {r["start"]: r["path"] for r in out.take_all()}

    path = [(i, i + 1) for i in range(6)]
    assert run(path) == replay(path, 4)

    star = [(0, i) for i in range(1, 7)]
    assert run(star) == replay(star, 4)

    rng = random.Random(9)
    nodes = list(range(20))
    rand = sorted({tuple(sorted(rng.sample(nodes, 2)))
                   for _ in range(40)})
    want = replay(rand, 4)
    got = run(rand, 4)
    assert got == want
    assert run(rand, 4, nparts=1) == want
    edge_set = {e for a, b in rand for e in ((a, b), (b, a))}
    for start, p in got.items():
        hops = [int(x) for x in p.split(">")]
        assert len(hops) == 5 and hops[0] == start
        assert all((a, b) in edge_set for a, b in zip(hops, hops[1:]))


def test_scc_labels_matches_tarjan(ray_session):
    """scc_labels (FW-BW label intersection on the directed Pregel
    ring) equals pure-Python Tarjan on: a 3-cycle + tail, two cycles
    joined by a one-way bridge (must NOT merge), a DAG (all
    singletons), adversarial id order (min ids placed to force multi
    outer rounds), and random digraphs; layout-invariant."""
    import random
    import sys

    import ray.data as rd
    from information_extraction_system_ray.functions.graphops import \
        scc_labels

    def tarjan(edges):
        adj = {}
        nodes = set()
        for a, b in edges:
            adj.setdefault(a, []).append(b)
            nodes.update((a, b))
        sys.setrecursionlimit(10000)
        idx, low, onstk, stk = {}, {}, set(), []
        out, cnt = {}, [0]

        def strong(x):
            idx[x] = low[x] = cnt[0]
            cnt[0] += 1
            stk.append(x)
            onstk.add(x)
            for y in adj.get(x, []):
                if y not in idx:
                    strong(y)
                    low[x] = min(low[x], low[y])
                elif y in onstk:
                    low[x] = min(low[x], idx[y])
            if low[x] == idx[x]:
                comp = []
                while True:
                    w = stk.pop()
                    onstk.discard(w)
                    comp.append(w)
                    if w == x:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m

        for n in sorted(nodes):
            if n not in idx:
                strong(n)
        return out

    def run(edges, nparts=3):
        t = pa.table({"u": pa.array([a for a, _ in edges], pa.int64()),
                      "v": pa.array([b for _, b in edges], pa.int64())})
        out = scc_labels(rd.from_arrow(t).repartition(nparts),
                         num_partitions=3)
        return {r["node"]: r["scc"] for r in out.take_all()}

    cyc_tail = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    assert run(cyc_tail) == tarjan(cyc_tail)

    # two 2-cycles, one-way bridge: {10,11} and {20,21} must NOT merge
    bridge = [(10, 11), (11, 10), (20, 21), (21, 20), (11, 20)]
    got = run(bridge)
    assert got == tarjan(bridge)
    assert got[10] != got[20]

    dag = [(i, i + 1) for i in range(8)]
    assert run(dag) == tarjan(dag)

    # adversarial: chain of 2-cycles with ids ordered so only ONE
    # component can settle per outer round (the backward min always
    # bleeds from the settled side)
    adv = []
    for i in range(5):
        a, b = 2 * i, 2 * i + 1
        adv += [(a, b), (b, a)]
        if i:
            adv.append((2 * (i - 1), a))
    assert run(adv) == tarjan(adv)

    # 20-round worst case (r5 fused-SCCShard evidence): 20 2-cycles
    # chained so every component's backward label bleeds from the
    # not-yet-settled downstream min — exactly ONE component settles
    # per outer round, so this drives 20 full settle/drop exchanges
    # through the in-actor loop
    deep = []
    for i in range(20):
        a, b = 2 * i, 2 * i + 1
        deep += [(a, b), (b, a)]
        if i:
            deep.append((a, 2 * (i - 1)))   # bridge toward smaller ids
    got = run(deep)
    assert got == tarjan(deep)
    assert len(set(got.values())) == 20

    rng = random.Random(3)
    for trial in range(3):
        nodes = list(range(30))
        rand = sorted({(rng.choice(nodes), rng.choice(nodes))
                       for _ in range(70)})
        rand = [(a, b) for a, b in rand if a != b]
        want = tarjan(rand)
        assert run(rand) == want
        if trial == 0:
            assert run(rand, nparts=1) == want


def test_part_graph_sssp_query_matches_duckdb_dijkstra(ray_session):
    """End-to-end oracle for the registry query: derive the weighted
    co-occurrence edges INDEPENDENTLY in DuckDB (same basket semantics
    as the BFS oracle, cost = max(1, 8 − support)), run pure-Python
    Dijkstra, compare to the Ray Pregel result at sf0.001."""
    import heapq

    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    edges = con.execute(f"""
        WITH d AS (SELECT DISTINCT l_orderkey, l_partkey
                   FROM '{sf}/lineitem.parquet'),
        e AS (SELECT a.l_partkey u, b.l_partkey v, COUNT(*) n
              FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        SELECT u, v, GREATEST(1, 8 - n) AS w FROM e
    """).fetchall()
    src = min(min(u, v) for u, v, _ in edges)
    adj = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    dist, heap = {}, [(0, src)]
    while heap:
        d, n = heapq.heappop(heap)
        if n in dist:
            continue
        dist[n] = d
        for m, w in adj.get(n, []):
            if m not in dist:
                heapq.heappush(heap, (d + w, m))

    out = e.queries()["part_graph_sssp"](sf).to_pandas()
    got = dict(zip(out["node"], out["dist"]))
    assert got == dist


def _lpa_single_process(edges, rounds=5):
    """Reference synchronous LPA with the same deterministic rule."""
    from collections import Counter, defaultdict

    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    label = {n: n for n in nbrs}
    for _ in range(rounds):
        new = {}
        for n in nbrs:
            cnt = Counter(label[m] for m in nbrs[n])
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[n] = best[0]
        label = new
    return label


def test_label_propagation_parity_planted_cliques(ray_session):
    """Two planted 6-cliques joined by one bridge edge: distributed LPA
    equals the single-process reference node-for-node, and the two
    cliques keep distinct labels."""
    import pyarrow as pa
    import ray.data

    from information_extraction_system_ray.functions.graphops import label_propagation

    c1 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    c2 = [(i, j) for i in range(10, 16) for j in range(i + 1, 16)]
    edges = c1 + c2 + [(5, 10)]
    ds = ray.data.from_arrow(pa.table({
        "u": pa.array([e[0] for e in edges], pa.int64()),
        "v": pa.array([e[1] for e in edges], pa.int64())}))
    got = {int(r["lnode"]): int(r["label"])
           for r in label_propagation(ds, rounds=5).take_all()}
    want = _lpa_single_process(edges, rounds=5)
    assert got == want
    assert len({got[i] for i in range(6)}) == 1
    assert len({got[i] for i in range(10, 16)}) == 1
    assert got[0] != got[10]
    # layout invariance
    got7 = {int(r["lnode"]): int(r["label"])
            for r in label_propagation(ds.repartition(7),
                                       rounds=5).take_all()}
    assert got7 == got


def test_boruvka_msf_matches_kruskal(ray_session):
    """boruvka_msf (functions/graphops.py — per-round strict-order
    component minima, CC contraction) matches a pure-Python Kruskal
    union-find on: a weighted path, a cycle where the heaviest edge must
    be dropped, a two-component forest, parallel/duplicate edges with
    ties (MSF total weight is tie-invariant), and random weighted graphs
    incl. an all-equal-weights one; layout-invariant."""
    import random

    import ray.data as rd
    from information_extraction_system_ray.functions.graphops import \
        boruvka_msf

    def kruskal(edges):
        nodes = sorted({n for e in edges for n in e[:2]})
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        total = picked = 0
        for w, a, b in sorted((w, a, b) for a, b, w in edges if a != b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
                total += w
                picked += 1
        comps = len({find(n) for n in nodes})
        return {"n_nodes": len(nodes), "n_components": comps,
                "n_msf_edges": picked, "total_weight": total}

    def run(edges, nparts=4):
        t = pa.table({"u": pa.array([a for a, _, _ in edges], pa.int64()),
                      "v": pa.array([b for _, b, _ in edges], pa.int64()),
                      "w": pa.array([w for _, _, w in edges], pa.int64())})
        return boruvka_msf(rd.from_arrow(t).repartition(nparts),
                           num_partitions=3)

    path = [(i, i + 1, 2 + (i % 3)) for i in range(8)]
    assert run(path) == kruskal(path)

    # cycle: exactly the heaviest rim edge is dropped
    cyc = [(i, (i + 1) % 6, 1 + i) for i in range(6)]
    got = run(cyc)
    assert got == kruskal(cyc)
    assert got["total_weight"] == sum(range(1, 6))  # drops weight 6

    # two components + self loop + duplicate parallel edges with ties
    forest = [(0, 1, 5), (1, 2, 5), (0, 2, 5), (3, 3, 1),
              (10, 11, 2), (10, 11, 2), (11, 12, 7)]
    got = run(forest)
    assert got == kruskal(forest)
    assert got["n_components"] == 3  # {0,1,2}, {3}, {10,11,12}

    rng = random.Random(41)
    nodes = list(range(40))
    rand = sorted({tuple(sorted(rng.sample(nodes, 2)))
                   for _ in range(90)})
    rand = [(a, b, 1 + rng.randrange(9)) for a, b in rand]
    rand += [(500, 501, 4)]  # far island
    want = kruskal(rand)
    assert run(rand) == want
    assert run(rand, nparts=1) == want

    # all-equal weights: any spanning forest works, census is invariant
    eq = [(a, b, 3) for a, b, _ in rand]
    assert run(eq) == kruskal(eq)



def test_double_sweep_diameter_bounds(ray_session):
    """double_sweep_diameter is EXACT on trees (path, star, random
    tree) and on general graphs returns ceil(D/2) <= lb <= D vs a
    brute all-pairs BFS; layout-invariant."""
    import collections
    import random

    import ray.data as rd
    from information_extraction_system_ray.functions.graphops import \
        double_sweep_diameter

    def brute_diameter(edges):
        adj = collections.defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        best = 0
        for s in adj:
            dist = {s: 0}
            q = collections.deque([s])
            while q:
                n = q.popleft()
                for m in adj[n]:
                    if m not in dist:
                        dist[m] = dist[n] + 1
                        q.append(m)
            best = max(best, max(dist.values()))
        return best

    def run(edges, nparts=4):
        t = pa.table({"u": pa.array([a for a, _ in edges], pa.int64()),
                      "v": pa.array([b for _, b in edges], pa.int64())})
        return double_sweep_diameter(rd.from_arrow(t).repartition(nparts),
                                     num_partitions=3)

    path = [(i, i + 1) for i in range(9)]
    got = run(path)
    assert got["diameter_lb"] == 9 and got["n_reached"] == 10

    star = [(0, i) for i in range(1, 7)]
    assert run(star)["diameter_lb"] == 2

    rng = random.Random(23)
    # random tree: exactness guarantee
    tree = [(rng.randrange(i), i) for i in range(1, 25)]
    assert run(tree)["diameter_lb"] == brute_diameter(tree)

    # general random graph: ceil(D/2) <= lb <= D, layout-invariant
    nodes = list(range(30))
    rand = sorted({tuple(sorted(rng.sample(nodes, 2)))
                   for _ in range(45)})
    d_true = brute_diameter(rand)
    got = run(rand)
    assert (d_true + 1) // 2 <= got["diameter_lb"] <= d_true
    assert run(rand, nparts=1) == got


def test_modularity_recompute_golden(ray_session):
    """part_graph_modularity's exact-integer Q equals a pure-pandas
    recomputation from the same LPA labels on the sf0.001 graph."""
    import pandas as pd

    from information_extraction_system_ray.functions.graphops import \
        label_propagation
    from information_extraction_system_ray.queries import (_join_parts,
                                              _part_strong_edges,
                                              part_graph_modularity)

    sf = "/root/testdata/sf0.001"
    got = part_graph_modularity(sf).to_pandas().iloc[0]

    edges = _part_strong_edges(sf).to_pandas()
    labels = label_propagation(
        _part_strong_edges(sf).materialize(), rounds=5,
        num_partitions=_join_parts(sf)).to_pandas()
    lab = dict(zip(labels["lnode"], labels["label"]))
    cu = edges["u"].map(lab)
    cv = edges["v"].map(lab)
    m = len(edges)
    m_intra = int((cu == cv).sum())
    dc = pd.concat([cu, cv]).value_counts()
    sum_dc2 = int((dc.astype("int64") ** 2).sum())
    num = 4 * m * m_intra - sum_dc2
    den = 4 * m * m
    q_ppm = (2 * 1_000_000 * num + den) // (2 * den)
    assert int(got["n_edges"]) == m
    assert int(got["intra_edges"]) == m_intra
    assert int(got["modularity_ppm"]) == q_ppm
    assert int(got["n_communities"]) == int(dc.size)
