"""Degenerate-input hardening: empty/boilerplate-only/invalid-UTF-8 pages
must flow through the whole flagship without crashing and with correct
per-row semantics (no mentions/triples, byte-policy text)."""

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def weird_pages(ray_session):
    import ray.data as rd

    rows = [
        ("https://w.example/empty-html", b"", None),
        ("https://w.example/boiler-only",
         b"<html><head><title>t</title></head><body><nav>menu</nav>"
         b"<footer>foot</footer></body></html>", None),
        ("https://w.example/empty-text", b"<p>ignored</p>", ""),
        ("https://w.example/bad-utf8", b"<p>caf\xe9 latt\xe9</p>", None),
        ("https://w.example/entities",
         b"<p>A &amp; B &lt;3 &#x41;&#66;</p>", None),
        ("https://w.example/real",
         b"<p>Ada Lovelace founded Analytical Engines in London.</p>", None),
    ]
    t = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([0] * len(rows), pa.timestamp("us")),
        "html": pa.array([r[1] for r in rows], pa.binary()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
    })
    return rd.from_arrow(t)


def test_strip_degenerate(weird_pages):
    from information_extraction_system_ray.stages.strip import extract_text
    from refimpl.htmlstrip import strip_html

    out = extract_text(weird_pages, num_parts=4, with_sha=True).to_pandas() \
        .set_index("url")
    assert out.loc["https://w.example/empty-html", "text"] == ""
    assert out.loc["https://w.example/boiler-only", "text"] == ""
    assert out.loc["https://w.example/empty-text", "text"] == ""
    # invalid UTF-8 → U+FFFD replacement, per the documented byte policy
    assert out.loc["https://w.example/bad-utf8", "text"] == \
        strip_html(b"<p>caf\xe9 latt\xe9</p>")
    assert "�" in out.loc["https://w.example/bad-utf8", "text"]
    assert out.loc["https://w.example/entities", "text"] == "A & B <3 AB"


def test_flagship_degenerate_end_to_end(weird_pages):
    from information_extraction_system_ray.pipelines.flagship import (
        annotate, build_graph)

    ann = annotate(weird_pages, num_parts=4).materialize()
    df = ann.to_pandas().set_index("url")
    assert len(df) == 6
    for u in ("https://w.example/empty-html", "https://w.example/empty-text",
              "https://w.example/boiler-only"):
        assert len(df.loc[u, "mentions"]) == 0
        assert len(df.loc[u, "triples"]) == 0
    g = build_graph(ann)
    edges = g["edges"].to_pandas()
    # the one real sentence must produce its triple through the whole DAG
    assert (edges["pred"] == "founded").any()
