"""G1 evaluation operator, salted aggregation, and D4 url dedup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_evaluate_tags_counts(ray_session):
    import ray.data as rd

    from information_extraction_system_ray.functions.evaluate import evaluate_tags
    from refimpl.vocab import BIO_LABELS

    # two rows with known confusion: pred vs gold
    pred = [[0, 1, 1, 0], [2, 2, 0]]
    gold = [[0, 1, 2, 0], [2, 0, 0]]
    ds = rd.from_arrow(pa.table({
        "tags": pa.array(pred, pa.list_(pa.int8())),
        "gold_tags": pa.array(gold, pa.list_(pa.int8())),
    }))
    out = evaluate_tags(ds).set_index("label_id")
    # label 0: pred {0,3,6(row2 idx2)}: positions row1:0,3 row2:2 →
    # gold 0 at row1:0,3 row2:1,2 → tp=3, fp=0, fn=1
    assert out.loc[0, "tp"] == 3 and out.loc[0, "fp"] == 0 \
        and out.loc[0, "fn"] == 1
    # label 1: pred row1:{1,2}, gold row1:{1} → tp=1 fp=1 fn=0
    assert out.loc[1, "tp"] == 1 and out.loc[1, "fp"] == 1 \
        and out.loc[1, "fn"] == 0
    # label 2: pred row2:{0,1}, gold row1:{2} row2:{0} → tp=1 fp=1 fn=1
    assert out.loc[2, "tp"] == 1 and out.loc[2, "fp"] == 1 \
        and out.loc[2, "fn"] == 1
    assert len(out) == len(BIO_LABELS)
    assert out.loc[1, "precision"] == 0.5 and out.loc[1, "recall"] == 1.0


def test_evaluate_tags_model_vs_gold(ray_session):
    """End-to-end: tagger predictions vs gold tags over a fresh corpus —
    the distributed counts must equal a single-process recount."""
    import ray.data as rd

    from information_extraction_system_ray.functions.evaluate import evaluate_tags
    from refimpl.crf import hash_features, viterbi_batch
    from refimpl.oracle import get_model, gold_tag_ids
    from refimpl.pagegen import gen_pages
    from refimpl.tokenizer import tokenize

    W, T = get_model()
    preds, golds = [], []
    for page in gen_pages(40, seed=99):
        toks, offs = tokenize(page.text)
        if not toks:
            continue
        preds.append(viterbi_batch([hash_features(toks)], W, T)[0]
                     .astype(np.int8))
        golds.append(gold_tag_ids(page, toks, offs).astype(np.int8))
    ds = rd.from_arrow(pa.table({
        "tags": pa.array([p.tolist() for p in preds], pa.list_(pa.int8())),
        "gold_tags": pa.array([g.tolist() for g in golds],
                              pa.list_(pa.int8())),
    })).repartition(4)
    out = evaluate_tags(ds)
    tp = fp = fn = 0
    for p, g in zip(preds, golds):
        for lab in range(7):
            tp += int(((p == lab) & (g == lab)).sum())
            fp += int(((p == lab) & (g != lab)).sum())
            fn += int(((p != lab) & (g == lab)).sum())
    assert int(out["tp"].sum()) == tp
    assert int(out["fp"].sum()) == fp
    assert int(out["fn"].sum()) == fn
    # the trained model should be decent on its own distribution
    micro_p = tp / max(1, tp + fp)
    assert micro_p > 0.9


def test_salted_group_sum_equals_plain(ray_session):
    import ray.data as rd

    from information_extraction_system_ray.functions.salted import salted_group_sum

    # skewed: one hot key with 30% frequency (SURVEY.md §5 item 5)
    rng = np.random.default_rng(3)
    keys = np.where(rng.random(20_000) < 0.3, "HOT",
                    rng.integers(0, 50, 20_000).astype(str))
    vals = rng.integers(0, 1000, 20_000)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys.tolist(), pa.string()),
        "v": pa.array(vals, pa.int64()),
    })).repartition(16)
    salted = salted_group_sum(ds, "k", value="v", num_salts=8) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    plain = (pd.DataFrame({"k": keys, "v": vals}).groupby("k")
             .agg(n=("v", "size"), sum_v=("v", "sum")).reset_index()
             .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        salted, plain[["k", "n", "sum_v"]], check_dtype=False)


def test_dedup_pages_by_url(ray_session):
    import ray.data as rd

    from information_extraction_system_ray.functions.dedup import dedup_pages_by_url
    from information_extraction_system_ray.sources.pages import synth_pages

    base = synth_pages(64).materialize()
    # re-capture 16 urls with bumped warc_ts and different html
    def bump(t: pa.Table) -> pa.Table:
        t = t.slice(0, min(16, t.num_rows))
        ts = pa.array([x.as_py() + pd.Timedelta(days=1)
                       for x in t["warc_ts"]], pa.timestamp("us"))
        html = pa.array([b"<html>recapture</html>"] * t.num_rows,
                        pa.binary())
        return (t.set_column(t.schema.get_field_index("warc_ts"),
                             "warc_ts", ts)
                .set_column(t.schema.get_field_index("html"), "html", html))

    dup = base.map_batches(bump, batch_format="pyarrow")
    merged = base.union(dup)
    out = dedup_pages_by_url(merged).to_pandas()
    assert len(out) == 64
    assert out["url"].is_unique
    # bumped captures must win for the duplicated urls
    dup_urls = set(dup.to_pandas()["url"])
    won = out[out["url"].isin(dup_urls)]
    assert (won["html"] == b"<html>recapture</html>").all()
    # exact-duplicate rows collapse to one
    twice = base.union(base.map_batches(lambda t: t,
                                        batch_format="pyarrow"))
    out2 = dedup_pages_by_url(twice).to_pandas()
    assert len(out2) == 64


def test_salted_join_equals_plain_merge(ray_session):
    """salted_join == pandas inner merge on a corpus with one
    pathologically hot key, on any salt count / partition layout, with
    duplicate build keys (1:N) included."""
    import pandas as pd
    import ray.data as rd
    from information_extraction_system_ray.functions.salted import salted_join

    probe = pd.DataFrame({
        "pid": range(500),
        "k": ["hot"] * 400 + ["warm"] * 80 + [f"c{i}" for i in range(20)],
    })
    build = pd.DataFrame({
        "bk": ["hot", "warm", "c3", "c7", "hot"],      # dup build key 1:N
        "attr": [10, 20, 30, 40, 50],
    })
    want = (probe.merge(build, left_on="k", right_on="bk")
            [["pid", "k", "attr"]]
            .sort_values(["pid", "attr"]).reset_index(drop=True))

    for salts, nparts in [(8, 4), (3, 7), (1, 4)]:
        got = salted_join(
            rd.from_arrow(pa.Table.from_pandas(probe)).repartition(5),
            rd.from_arrow(pa.Table.from_pandas(build)).repartition(2),
                          probe_key="k", build_key="bk",
                          build_cols=["attr"], num_salts=salts,
                          num_partitions=nparts).to_pandas()
        got = got.sort_values(["pid", "attr"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
