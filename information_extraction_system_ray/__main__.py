"""CLI entry points — the reference's train / extract / evaluate surface
(SURVEY.md §3.1), re-expressed over Ray Data.

    python -m information_extraction_system_ray train   --out /tmp/weights.npz
    python -m information_extraction_system_ray extract --pages <parquet-dir> \\
        --out /tmp/kg [--num-parts 64] [--resume]
    python -m information_extraction_system_ray extract --synth 10000 --out /tmp/kg
    python -m information_extraction_system_ray evaluate [--pages-n 200]

This module OWNS a Ray session (guarded init) — the only places allowed to
besides bench.py and the test fixture (driver contract, __ray_entry__.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from .context import tune_context

    tune_context()
    return ray


def cmd_train(args) -> int:
    from refimpl.crf import save_model, train_perceptron
    from refimpl.oracle import build_training_sequences

    t0 = time.time()
    W, T = train_perceptron(build_training_sequences(args.n_pages),
                            epochs=args.epochs)
    save_model(args.out, W, T)
    print(json.dumps({"cmd": "train", "out": args.out,
                      "n_pages": args.n_pages, "epochs": args.epochs,
                      "wall_s": round(time.time() - t0, 2)}))
    return 0


def cmd_extract(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .pipelines.flagship import run_flagship
    from .sources.pages import read_pages, synth_pages
    from .state.manifest import Manifest, corpus_fingerprint

    n_ent = getattr(args, "entities", None)
    pages = synth_pages(args.synth, n_entities=n_ent) if args.synth \
        else read_pages(args.pages)
    t0 = time.time()
    if args.resume and not args.out:
        print("--resume requires --out", file=sys.stderr)
        return 2
    fp = corpus_fingerprint(args.pages, synth_n=args.synth,
                            n_entities=n_ent)
    if args.out and not args.resume and Manifest(args.out).has_records():
        print(f"{args.out} already holds committed results; pass --resume "
              "to reuse them (stale-input partitions are recomputed) or "
              "remove the directory", file=sys.stderr)
        return 2
    ncpu = args.num_cpus or 8
    res = run_flagship(pages, out_dir=args.out or None,
                       num_parts=args.num_parts,
                       concurrency=(max(2, ncpu * 3 // 4), max(2, ncpu)),
                       batch_size=args.batch_size,
                       input_fingerprint=fp, n_entities=n_ent)
    if args.out:
        print(json.dumps({"cmd": "extract", "out_dir": res["out_dir"],
                          "metrics": res["metrics"],
                          "wall_s": round(time.time() - t0, 2)}))
    else:
        n_nodes = res["nodes"].count()
        n_edges = res["edges"].count()
        print(json.dumps({"cmd": "extract", "nodes": n_nodes,
                          "edges": n_edges,
                          "wall_s": round(time.time() - t0, 2)}))
    ray.shutdown()
    return 0


def cmd_update(args) -> int:
    """Incremental KG update: append a NEW pages batch to an existing
    checkpointed extract output — per-page stages run for the delta
    only, the graph stage rebuilds over old ∪ delta (see
    pipelines/flagship.py update_flagship)."""
    ray = _ray_session(args.num_cpus)
    from .pipelines.flagship import update_flagship
    from .sources.pages import read_pages
    from .state.manifest import corpus_fingerprint

    t0 = time.time()
    pages = read_pages(args.pages)
    fp = corpus_fingerprint(args.pages)
    ncpu = args.num_cpus or 8
    res = update_flagship(pages, args.out,
                          num_parts_new=args.num_parts_new,
                          concurrency=(max(2, ncpu * 3 // 4),
                                       max(2, ncpu)),
                          batch_size=args.batch_size,
                          input_fingerprint=fp,
                          n_entities=getattr(args, "entities", None))
    print(json.dumps({"cmd": "update", "out_dir": res["out_dir"],
                      "base_part": res["base_part"],
                      "metrics": res["metrics"],
                      "wall_s": round(time.time() - t0, 2)}))
    ray.shutdown()
    return 0


def cmd_ingest(args) -> int:
    """Raw documents (.txt/.html/.pdf/...) → pages-schema Parquet, ready
    for ``extract --pages``."""
    ray = _ray_session(args.num_cpus)
    from .sources.rawdocs import ingest_documents

    t0 = time.time()
    pages = ingest_documents(args.docs, decoder=args.decoder)
    pages.write_parquet(args.out)
    n = ray.data.read_parquet(args.out).count()
    print(json.dumps({"cmd": "ingest", "docs": args.docs, "out": args.out,
                      "pages": n, "wall_s": round(time.time() - t0, 2)}))
    ray.shutdown()
    return 0


def cmd_media(args) -> int:
    """Directory of media files → MEDIA_SCHEMA rows → real-decoder
    feature tables (round 3): images (.ppm/.pgm/.bmp) → 64-d features,
    audio (.wav) → log-mel frames, video (.ppms concatenated-P6
    streams) → sampled frame keys. One parquet dir per modality under
    --out. The decode stages are the actor pools from
    stages/multimodal.py with decoder='real'."""
    import os

    import pyarrow as pa

    ray = _ray_session(args.num_cpus)
    from .sources.mediacodec import decode_wav, iter_ppm_stream
    from .stages.multimodal import (MEDIA_SCHEMA, decode_audio,
                                    decode_images, sample_frames)

    _KIND = {".ppm": "image", ".pgm": "image", ".bmp": "image",
             ".wav": "audio", ".ppms": "video"}
    _MIME = {".ppm": "image/x-portable-pixmap",
             ".pgm": "image/x-portable-graymap", ".bmp": "image/bmp",
             ".wav": "audio/wav", ".ppms": "video/x-ppm-stream"}

    def to_media(t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_SCHEMA.names}
        for i, (path, payload) in enumerate(
                zip(t["path"].to_pylist(), t["bytes"].to_pylist())):
            ext = os.path.splitext(path)[1].lower()
            kind = _KIND.get(ext)
            if kind is None:
                continue
            dur = 0
            if kind == "audio":
                samples, rate = decode_wav(payload)
                dur = int(1000 * len(samples) / rate)
            elif kind == "video":
                dur = 1000 * max(1, sum(1 for _ in
                                        iter_ppm_stream(payload)))
            rows["media_id"].append(
                int.from_bytes(os.path.basename(path).encode()[:6],
                               "big"))
            rows["kind"].append(kind)
            rows["payload"].append(payload)
            rows["mime"].append(_MIME[ext])
            rows["width"].append(0)
            rows["height"].append(0)
            rows["duration_ms"].append(dur)
        return pa.table({
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "kind": pa.array(rows["kind"], pa.string()),
            "payload": pa.array(rows["payload"], pa.binary()),
            "mime": pa.array(rows["mime"], pa.string()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "duration_ms": pa.array(rows["duration_ms"], pa.int32()),
        }).cast(MEDIA_SCHEMA)

    t0 = time.time()
    media = ray.data.read_binary_files(args.media, include_paths=True) \
        .map_batches(to_media, batch_format="pyarrow").materialize()
    counts = {}
    for kind, fn, sub_kw in (
            ("image", decode_images, {"size": args.size}),
            ("audio", decode_audio, {"n_mels": args.n_mels}),
            ("video", sample_frames, {"every_ms": args.every_ms})):
        part = media.filter(expr=f"kind == '{kind}'")
        if part.count() == 0:
            counts[kind] = 0
            continue
        out_dir = os.path.join(args.out, kind)
        res = fn(part, decoder="real", **sub_kw)
        res.write_parquet(out_dir)
        counts[kind] = ray.data.read_parquet(out_dir).count()
    print(json.dumps({"cmd": "media", "media": args.media,
                      "out": args.out, "rows": counts,
                      "wall_s": round(time.time() - t0, 2)}))
    ray.shutdown()
    return 0


def cmd_query(args) -> int:
    """Run any registered queries() pipeline over an sf dir; print a head
    sample or write the full result (parquet/csv by extension)."""
    from .queries import queries

    q = queries()
    if args.name not in q:
        print("unknown query; available:", file=sys.stderr)
        for k in sorted(q):
            print(" ", k, file=sys.stderr)
        return 2
    ray = _ray_session(args.num_cpus)
    import pandas as pd
    import ray.data as rd

    t0 = time.time()
    res = q[args.name](args.sf_dir)
    if args.out:
        if isinstance(res, rd.Dataset):
            if args.out.endswith(".csv"):
                res.write_csv(args.out)
            else:
                res.write_parquet(args.out)
            n = res.count()
        else:
            df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
            if args.out.endswith(".csv"):
                df.to_csv(args.out, index=False)
            else:
                df.to_parquet(args.out, index=False)
            n = len(df)
        print(json.dumps({"cmd": "query", "name": args.name, "rows": n,
                          "out": args.out,
                          "wall_s": round(time.time() - t0, 2)}))
    else:
        df = res.to_pandas() if isinstance(res, rd.Dataset) else (
            res if isinstance(res, pd.DataFrame) else res.to_pandas())
        print(df.head(args.head).to_string(index=False))
        print(json.dumps({"cmd": "query", "name": args.name,
                          "rows": len(df),
                          "wall_s": round(time.time() - t0, 2)}))
    ray.shutdown()
    return 0


def cmd_dedup(args) -> int:
    """Dedup a documents parquet end-to-end: exact fingerprint pass
    (min-id survivor), then MinHash+LSH near-dup pairs → connected
    components → min-id survivor per cluster. Survivors written as
    partitioned Parquet; one JSON stats line on stdout. Every step is
    the streaming operator from functions/dedup.py / stages/
    canonicalize.py — no driver materialization of text or signatures."""
    ray = _ray_session(args.num_cpus)
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from .functions.dedup import exact_dedup, minhash_lsh_duplicates
    from .functions.joins import anti_join, semi_join
    from .stages.canonicalize import connected_components_distributed

    t0 = time.time()
    ds = rd.read_parquet(args.input)
    n_in = ds.count()

    keep = exact_dedup(ds, id_col=args.id_col, text_col=args.text_col)
    uniq = semi_join(ds, keep.select_columns([args.id_col]),
                     left_key=args.id_col, right_key=args.id_col)
    uniq = uniq.materialize()
    n_exact = uniq.count()

    pairs = minhash_lsh_duplicates(
        uniq, id_col=args.id_col, text_col=args.text_col,
        num_perm=args.num_perm, bands=args.bands,
        jaccard_threshold=args.threshold)
    labels = connected_components_distributed(pairs.map_batches(
        lambda t: pa.table({"src": pc.cast(t["id_a"], pa.string()),
                            "dst": pc.cast(t["id_b"], pa.string())}),
        batch_format="pyarrow"))

    def losers(g) -> pa.Table:
        ids = g["node"].astype("int64").sort_values()
        return pa.table({args.id_col: pa.array(ids.iloc[1:].to_numpy(),
                                               pa.int64())})

    removed = labels.groupby("label").map_groups(losers,
                                                 batch_format="pandas")
    out = anti_join(uniq, removed, left_key=args.id_col,
                    right_key=args.id_col)
    out.write_parquet(args.out)
    n_out = rd.read_parquet(args.out).count()
    print(json.dumps({"cmd": "dedup", "input_rows": n_in,
                      "after_exact": n_exact, "survivors": n_out,
                      "out": args.out,
                      "wall_s": round(time.time() - t0, 2)}))
    ray.shutdown()
    return 0


def cmd_evaluate(args) -> int:
    ray = _ray_session(args.num_cpus)
    if args.kfold:
        from .pipelines.kfold import kfold_evaluate

        out = kfold_evaluate(args.pages_n, args.kfold, seed=args.seed)
        print(out.to_string(index=False,
                            float_format=lambda x: f"{x:.4f}"))
        ray.shutdown()
        return 0
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from .functions.evaluate import evaluate_tags
    from refimpl.crf import hash_features, viterbi_batch
    from refimpl.oracle import get_model, gold_tag_ids
    from refimpl.pagegen import gen_pages
    from refimpl.tokenizer import tokenize

    W, T = get_model()
    preds, golds = [], []
    for page in gen_pages(args.pages_n, seed=args.seed):
        toks, offs = tokenize(page.text)
        if not toks:
            continue
        preds.append(viterbi_batch([hash_features(toks)], W, T)[0]
                     .astype(np.int8).tolist())
        golds.append(gold_tag_ids(page, toks, offs).astype(np.int8)
                     .tolist())
    ds = rd.from_arrow(pa.table({
        "tags": pa.array(preds, pa.list_(pa.int8())),
        "gold_tags": pa.array(golds, pa.list_(pa.int8())),
    })).repartition(8)
    out = evaluate_tags(ds)
    print(out.to_string(index=False,
                        float_format=lambda x: f"{x:.4f}"))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="information_extraction_system_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train CRF weights (deterministic)")
    t.add_argument("--out", required=True)
    t.add_argument("--n-pages", type=int, default=300)
    t.add_argument("--epochs", type=int, default=5)
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("extract", help="run the flagship KG pipeline")
    src = e.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="pages Parquet path/dir")
    src.add_argument("--synth", type=int,
                     help="synthesize N deterministic pages instead")
    e.add_argument("--out", help="checkpoint dir (enables manifest/resume)")
    e.add_argument("--resume", action="store_true",
                   help="skip partitions already committed in --out")
    e.add_argument("--num-parts", type=int, default=64)
    e.add_argument("--batch-size", type=int, default=128)
    e.add_argument("--num-cpus", type=int, default=None)
    e.add_argument("--entities", type=int, default=None,
                   help="entity-universe size for --synth corpora "
                        "(default: the base 95-entity universe; bench "
                        "uses ~sqrt(pages) so the KG grows with the "
                        "corpus)")
    e.set_defaults(fn=cmd_extract)

    upd = sub.add_parser("update",
                         help="incrementally add a pages batch to an "
                              "existing extract checkpoint")
    upd.add_argument("--pages", required=True,
                     help="NEW pages Parquet path/dir (the delta)")
    upd.add_argument("--out", required=True,
                     help="existing checkpoint dir from `extract --out`")
    upd.add_argument("--entities", type=int, default=None,
                     help="entity-universe size; MUST match the value "
                          "the checkpoint was extracted with")
    upd.add_argument("--num-parts-new", type=int, default=16,
                     help="partitions for the delta namespace")
    upd.add_argument("--batch-size", type=int, default=128)
    upd.add_argument("--num-cpus", type=int, default=None)
    upd.set_defaults(fn=cmd_update)

    g = sub.add_parser("ingest",
                       help="raw documents dir → pages-schema Parquet")
    g.add_argument("--docs", required=True, help="directory of raw files")
    g.add_argument("--out", required=True, help="output Parquet dir")
    g.add_argument("--decoder", default="real",
                   help="'real' (.txt/.html/.pdf/.docx via pure-stdlib "
                        "extractors; legacy .doc skipped) or 'fake' "
                        "(deterministic stub for any payload)")
    g.add_argument("--num-cpus", type=int, default=None)
    g.set_defaults(fn=cmd_ingest)

    m = sub.add_parser("media",
                       help="media dir → decoded feature Parquet "
                            "(PPM/PGM/BMP images, WAV audio, "
                            ".ppms frame streams)")
    m.add_argument("--media", required=True,
                   help="directory of media files")
    m.add_argument("--out", required=True, help="output Parquet dir")
    m.add_argument("--size", type=int, default=32,
                   help="image resize edge")
    m.add_argument("--n-mels", type=int, default=16)
    m.add_argument("--every-ms", type=int, default=1000,
                   help="video frame sampling period")
    m.add_argument("--num-cpus", type=int, default=None)
    m.set_defaults(fn=cmd_media)

    r = sub.add_parser("query", help="run a registered query pipeline")
    r.add_argument("name", help="query name from the registry")
    r.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    r.add_argument("--out", help="write result (.parquet dir / .csv)")
    r.add_argument("--head", type=int, default=20)
    r.add_argument("--num-cpus", type=int, default=None)
    r.set_defaults(fn=cmd_query)

    d = sub.add_parser("dedup",
                       help="exact + near-dup dedup of a docs parquet")
    d.add_argument("input", help="input parquet file/dir")
    d.add_argument("--out", required=True, help="survivors parquet dir")
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--text-col", default="text")
    d.add_argument("--num-perm", type=int, default=64)
    d.add_argument("--bands", type=int, default=32)
    d.add_argument("--threshold", type=float, default=0.5)
    d.add_argument("--num-cpus", type=int, default=None)
    d.set_defaults(fn=cmd_dedup)

    v = sub.add_parser("evaluate",
                       help="per-label P/R/F1 of the tagger vs gold")
    v.add_argument("--pages-n", type=int, default=200)
    v.add_argument("--seed", type=int, default=99)
    v.add_argument("--kfold", type=int, default=0,
                   help="k-fold cross-validation: train k fold models, "
                        "score each held-out fold distributed")
    v.add_argument("--num-cpus", type=int, default=None)
    v.set_defaults(fn=cmd_evaluate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
