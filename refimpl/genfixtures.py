"""Generate golden fixtures into tests/fixtures/ (FIXTURES.md).

Run: ``python -m refimpl.genfixtures``. Deterministic (seed 42 corpus,
seed 43 training corpus, fixed epochs) — re-running reproduces identical
bytes, which is asserted by tests/test_fixtures_reproducible.py on the tiny
corpus.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import SEED
from .crf import hash_features, save_model, train_perceptron, viterbi_batch
from .oracle import build_training_sequences, gold_tag_ids, run_oracle
from .pagegen import gen_pages, pages_arrow
from .tokenizer import tokenize
from .vocab import BIO_LABELS, alias_rows

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                      "tests", "fixtures")

TINY, SMALL = 64, 2000


def _write(name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(FIXDIR, name))
    print(f"  {name}: {table.num_rows} rows")


def main() -> None:
    os.makedirs(FIXDIR, exist_ok=True)

    print("training CRF (averaged perceptron, 5 epochs, seed 43 corpus)")
    W, T = train_perceptron(build_training_sequences(), epochs=5)
    save_model(os.path.join(FIXDIR, "crf_weights.npz"), W, T)

    for label, n in (("tiny", TINY), ("small", SMALL)):
        print(f"{label} corpus ({n} pages)")
        pages = gen_pages(n, seed=SEED)
        _write(f"pages_{label}.parquet", pages_arrow(pages))

        out = run_oracle(pages)
        _write(f"gold_extracted_{label}.parquet", pa.table({
            "url": [r["url"] for r in out["extracted"]],
            "text": [r["text"] for r in out["extracted"]],
            "text_sha256": pa.array(
                [r["text_sha256"] for r in out["extracted"]], pa.binary()),
        }))
        _write(f"gold_triples_{label}.parquet", pa.table({
            "url": [r["url"] for r in out["triples"]],
            "subj": [r["subj"] for r in out["triples"]],
            "pred": [r["pred"] for r in out["triples"]],
            "obj": [r["obj"] for r in out["triples"]],
            "subj_entity_id": [r["subj_entity_id"] for r in out["triples"]],
            "obj_entity_id": [r["obj_entity_id"] for r in out["triples"]],
        }))
        _write(f"gold_mentions_{label}.parquet", pa.table({
            "url": [r["url"] for r in out["mentions"]],
            "start": pa.array([r["start"] for r in out["mentions"]],
                              pa.int32()),
            "end": pa.array([r["end"] for r in out["mentions"]], pa.int32()),
            "surface": [r["surface"] for r in out["mentions"]],
            "label": [r["label"] for r in out["mentions"]],
            "entity_id": [r["entity_id"] for r in out["mentions"]],
            "link_score": pa.array([r["link_score"] for r in out["mentions"]],
                                   pa.float64()),
        }))
        _write(f"gold_nodes_{label}.parquet", pa.table({
            "entity_id": [r["entity_id"] for r in out["nodes"]],
            "canonical_surface": [r["canonical_surface"]
                                  for r in out["nodes"]],
            "aliases": pa.array([r["aliases"] for r in out["nodes"]],
                                pa.list_(pa.string())),
            "n_mentions": pa.array([r["n_mentions"] for r in out["nodes"]],
                                   pa.int64()),
        }))
        _write(f"gold_edges_{label}.parquet", pa.table({
            "subj_id": [r["subj_id"] for r in out["edges"]],
            "pred": [r["pred"] for r in out["edges"]],
            "obj_id": [r["obj_id"] for r in out["edges"]],
            "n_support": pa.array([r["n_support"] for r in out["edges"]],
                                  pa.int64()),
            "sample_urls": pa.array([r["sample_urls"] for r in out["edges"]],
                                    pa.list_(pa.string())),
        }))

    # CRF labeling corpus: one row per page, 80/20 split, + golden Viterbi
    # output of the trained model on the test split
    print("crf corpus (tiny pages)")
    rows = {"page_id": [], "url": [], "split": [], "tokens": [],
            "starts": [], "ends": [], "gold_tags": []}
    test_feats, test_ids = [], []
    pages = gen_pages(TINY, seed=SEED)
    for i, p in enumerate(pages):
        toks, offs = tokenize(p.text)
        tags = gold_tag_ids(p, toks, offs)
        split = "test" if (i * 2654435761) % 10 < 2 else "train"
        rows["page_id"].append(i)
        rows["url"].append(p.url)
        rows["split"].append(split)
        rows["tokens"].append(toks)
        rows["starts"].append([s for s, _ in offs])
        rows["ends"].append([e for _, e in offs])
        rows["gold_tags"].append([BIO_LABELS[t] for t in tags])
        if split == "test":
            test_feats.append(hash_features(toks))
            test_ids.append(i)
    _write("crf_corpus.parquet", pa.table({
        "page_id": pa.array(rows["page_id"], pa.int64()),
        "url": rows["url"], "split": rows["split"],
        "tokens": pa.array(rows["tokens"], pa.list_(pa.string())),
        "starts": pa.array(rows["starts"], pa.list_(pa.int32())),
        "ends": pa.array(rows["ends"], pa.list_(pa.int32())),
        "gold_tags": pa.array(rows["gold_tags"], pa.list_(pa.string())),
    }))
    decoded = viterbi_batch(test_feats, W, T)
    _write("tagged_gold.parquet", pa.table({
        "page_id": pa.array(test_ids, pa.int64()),
        "tags": pa.array([[BIO_LABELS[int(t)] for t in d] for d in decoded],
                         pa.list_(pa.string())),
    }))

    _write("alias_dict.parquet", pa.table({
        "surface": [r[0] for r in alias_rows()],
        "entity_id": [r[1] for r in alias_rows()],
        "prior": pa.array([r[2] for r in alias_rows()], pa.float64()),
    }))

    # corpus-level digest so golden drift is loud
    digest = hashlib.sha256()
    for f in sorted(os.listdir(FIXDIR)):
        if f.endswith(".parquet"):
            with open(os.path.join(FIXDIR, f), "rb") as fh:
                digest.update(f.encode())
                digest.update(fh.read())
    print("fixture digest:", digest.hexdigest()[:16])


if __name__ == "__main__":
    main()
