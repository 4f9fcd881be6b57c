"""Checkpoint/resume (SURVEY.md §5 item 4): kill-after-stage-N simulation —
drop some committed partitions + the graph stage, rerun, require outputs
identical to the uninterrupted run (== refimpl goldens)."""

import os
import shutil

import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "ckpt")


def _run(fixdir, out_dir):
    import ray.data as rd

    from information_extraction_system_ray.pipelines.flagship import \
        run_flagship

    pages = rd.read_parquet(os.path.join(fixdir, "pages_tiny.parquet"))
    return run_flagship(pages, out_dir=out_dir, num_parts=8,
                        concurrency=(1, 2))


def test_resume_recomputes_only_missing_and_matches_gold(
        ray_session, fixdir, out_dir):
    res = _run(fixdir, out_dir)
    assert all(m["partitions"] >= 1 for m in res["metrics"].values())

    # simulate a crash: 2 annotated partitions and the graph stage lost
    for p in (2, 6):
        shutil.rmtree(os.path.join(out_dir, f"annotated/part_id={p}"))
        os.remove(os.path.join(out_dir, f"_manifest/annotated/part-{p}.json"))
    shutil.rmtree(os.path.join(out_dir, "nodes"))
    shutil.rmtree(os.path.join(out_dir, "edges"))
    os.remove(os.path.join(out_dir, "_manifest/graph/part-0.json"))

    # extracted stage untouched → its files must not be rewritten
    ext_mtime = {
        f: os.path.getmtime(os.path.join(out_dir, "extracted", f))
        for f in os.listdir(os.path.join(out_dir, "extracted"))
    }
    _run(fixdir, out_dir)
    for f, m in ext_mtime.items():
        assert os.path.getmtime(
            os.path.join(out_dir, "extracted", f)) == m

    edges = pq.read_table(os.path.join(out_dir, "edges")).to_pandas()
    gold = pq.read_table(
        os.path.join(fixdir, "gold_edges_tiny.parquet")).to_pandas()
    edges["sample_urls"] = edges["sample_urls"].map(list)
    gold["sample_urls"] = gold["sample_urls"].map(list)
    assert edges.to_dict("records") == gold.to_dict("records")

    nodes = pq.read_table(os.path.join(out_dir, "nodes")).to_pandas() \
        .sort_values("entity_id").reset_index(drop=True)
    goldn = pq.read_table(
        os.path.join(fixdir, "gold_nodes_tiny.parquet")).to_pandas()
    nodes["aliases"] = nodes["aliases"].map(list)
    goldn["aliases"] = goldn["aliases"].map(list)
    assert nodes.to_dict("records") == goldn.to_dict("records")


def test_graph_crash_between_write_and_commit_no_duplicates(
        ray_session, fixdir, out_dir):
    """Crash AFTER nodes/edges write_parquet but BEFORE commit('graph'):
    the resumed run must clear the uncommitted files, not append to them
    (appending would duplicate every node/edge row)."""
    _run(fixdir, out_dir)
    # simulate: graph data landed but the commit record was lost
    os.remove(os.path.join(out_dir, "_manifest/graph/part-0.json"))
    _run(fixdir, out_dir)

    edges = pq.read_table(os.path.join(out_dir, "edges")).to_pandas()
    gold = pq.read_table(
        os.path.join(fixdir, "gold_edges_tiny.parquet")).to_pandas()
    assert len(edges) == len(gold)          # no row duplication
    nodes = pq.read_table(os.path.join(out_dir, "nodes")).to_pandas()
    goldn = pq.read_table(
        os.path.join(fixdir, "gold_nodes_tiny.parquet")).to_pandas()
    assert len(nodes) == len(goldn)


def test_stale_input_fingerprint_forces_recompute(ray_session, fixdir,
                                                  out_dir):
    """A committed partition whose recorded input_fingerprint differs from
    the current run's is treated as pending — different corpus, no stale
    checkpoint reuse."""
    import ray.data as rd

    from information_extraction_system_ray.pipelines.flagship import \
        run_flagship

    pages = rd.read_parquet(os.path.join(fixdir, "pages_tiny.parquet"))
    run_flagship(pages, out_dir=out_dir, num_parts=8, concurrency=(1, 2),
                 input_fingerprint="fp-A")
    ext = os.path.join(out_dir, "extracted")
    mtimes = {f: os.path.getmtime(os.path.join(ext, f))
              for f in os.listdir(ext)}

    # same fingerprint → nothing recomputed
    run_flagship(pages, out_dir=out_dir, num_parts=8, concurrency=(1, 2),
                 input_fingerprint="fp-A")
    assert {f: os.path.getmtime(os.path.join(ext, f))
            for f in os.listdir(ext)} == mtimes

    # different fingerprint → every partition recomputed
    run_flagship(pages, out_dir=out_dir, num_parts=8, concurrency=(1, 2),
                 input_fingerprint="fp-B")
    changed = {f: os.path.getmtime(os.path.join(ext, f))
               for f in os.listdir(ext)}
    assert all(changed[f] != m for f, m in mtimes.items()
               if f in changed) or set(changed) != set(mtimes)


def test_incremental_update_equals_batch(ray_session, tmp_path):
    """Round-3 incremental KG update: run_flagship(A) then
    update_flagship(B) must produce nodes/edges IDENTICAL to one batch
    run over A∪B (canonicalization is global — the update rebuilds the
    graph stage over old∪delta annotations), and re-applying the same
    update must be a committed no-op."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from information_extraction_system_ray.pipelines.flagship import (
        run_flagship, update_flagship)
    from information_extraction_system_ray.sources.pages import synth_pages

    N, CUT = 300, 200

    def _rng(lo, hi):
        def f(t: pa.Table) -> pa.Table:
            idx = pc.cast(pc.struct_field(
                pc.extract_regex(t["url"], r"p(?P<i>\d+)$"), "i"),
                pa.int64())
            return t.filter(pc.and_(pc.greater_equal(idx, lo),
                                    pc.less(idx, hi)))
        return synth_pages(N).map_batches(f, batch_format="pyarrow")

    batch_dir, inc_dir = str(tmp_path / "batch"), str(tmp_path / "inc")
    run_flagship(synth_pages(N), batch_dir, num_parts=6,
                 input_fingerprint="all")
    run_flagship(_rng(0, CUT), inc_dir, num_parts=6,
                 input_fingerprint="partA")
    up = update_flagship(_rng(CUT, N), inc_dir, num_parts_new=3,
                         input_fingerprint="partB")
    assert up["base_part"] == 6

    def _load(out, sub, keys):
        df = rd.read_parquet(f"{out}/{sub}").to_pandas() \
            .sort_values(keys).reset_index(drop=True)
        for c in df.columns:
            if df[c].dtype == object and len(df) and \
                    isinstance(df[c].iloc[0], (list, tuple)) or \
                    str(df[c].dtype) == "object" and len(df) and \
                    hasattr(df[c].iloc[0], "__len__") and \
                    not isinstance(df[c].iloc[0], (str, bytes)):
                df[c] = df[c].map(tuple)
        return df[sorted(df.columns)]

    for sub, keys in (("nodes", ["entity_id"]),
                      ("edges", ["subj_id", "pred", "obj_id"])):
        a = _load(batch_dir, sub, keys)
        b = _load(inc_dir, sub, keys)
        pd.testing.assert_frame_equal(a, b)

    # idempotence: re-applying the same delta resumes its registered
    # namespace (no duplicate pages) and leaves the graph untouched
    up2 = update_flagship(_rng(CUT, N), inc_dir, num_parts_new=3,
                          input_fingerprint="partB")
    assert up2["base_part"] == up["base_part"]
    for sub, keys in (("nodes", ["entity_id"]),
                      ("edges", ["subj_id", "pred", "obj_id"])):
        pd.testing.assert_frame_equal(_load(batch_dir, sub, keys),
                                      _load(inc_dir, sub, keys))


def test_incremental_update_equals_batch_scaled_universe(ray_session,
                                                         tmp_path):
    """r5: the A∪B == run(A)+update(B) contract holds at a SCALED entity
    universe — the delta's annotate stage must rebuild the same
    gazetteer/linker from the n_entities scalar as the original run
    (the bug class the update-CLI --entities threading prevents)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from information_extraction_system_ray.pipelines.flagship import (
        run_flagship, update_flagship)
    from information_extraction_system_ray.sources.pages import synth_pages

    N, CUT, ENT = 240, 160, 250

    def _rng(lo, hi):
        def f(t: pa.Table) -> pa.Table:
            idx = pc.cast(pc.struct_field(
                pc.extract_regex(t["url"], r"p(?P<i>\d+)$"), "i"),
                pa.int64())
            return t.filter(pc.and_(pc.greater_equal(idx, lo),
                                    pc.less(idx, hi)))
        return synth_pages(N, n_entities=ENT).map_batches(
            f, batch_format="pyarrow")

    batch_dir, inc_dir = str(tmp_path / "b"), str(tmp_path / "i")
    run_flagship(synth_pages(N, n_entities=ENT), batch_dir, num_parts=4,
                 input_fingerprint="all", n_entities=ENT)
    run_flagship(_rng(0, CUT), inc_dir, num_parts=4,
                 input_fingerprint="partA", n_entities=ENT)
    update_flagship(_rng(CUT, N), inc_dir, num_parts_new=2,
                    input_fingerprint="partB", n_entities=ENT)

    def _load(out, sub, keys):
        df = rd.read_parquet(f"{out}/{sub}").to_pandas() \
            .sort_values(keys).reset_index(drop=True)
        for c in df.columns:
            if df[c].dtype == object and len(df) and \
                    hasattr(df[c].iloc[0], "__len__") and \
                    not isinstance(df[c].iloc[0], (str, bytes)):
                df[c] = df[c].map(tuple)
        return df[sorted(df.columns)]

    for sub, keys in (("nodes", ["entity_id"]),
                      ("edges", ["subj_id", "pred", "obj_id"])):
        pd.testing.assert_frame_equal(_load(batch_dir, sub, keys),
                                      _load(inc_dir, sub, keys))
    # the scaled universe actually shows up in the output
    nodes = _load(batch_dir, "nodes", ["entity_id"])
    assert len(nodes) > 120, len(nodes)
