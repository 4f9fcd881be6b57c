"""S1 — pages Parquet reader path: read_parquet with column/row pruning must
feed the flagship identically to the in-memory synthesizer."""

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def pages_path(ray_session, tmp_path_factory):
    from information_extraction_system_ray.sources.pages import synth_pages

    d = str(tmp_path_factory.mktemp("pages") / "pages_parquet")
    synth_pages(256).write_parquet(d)
    return d


def test_read_pages_roundtrip(ray_session, pages_path):
    from information_extraction_system_ray.sources.pages import (read_pages,
                                                      synth_pages)

    got = read_pages(pages_path).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    want = synth_pages(256).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert (got["url"] == want["url"]).all()
    assert (got["html"] == want["html"]).all()
    assert got["text"].isna().equals(want["text"].isna())


def test_read_pages_lang_pruning(ray_session, pages_path):
    from information_extraction_system_ray.sources.pages import read_pages

    en = read_pages(pages_path, langs=["en"]).to_pandas()
    assert (en["lang"] == "en").all()
    allp = read_pages(pages_path).to_pandas()
    assert len(en) == (allp["lang"] == "en").sum()
    # column pruning
    two = read_pages(pages_path, columns=["url", "lang"])
    assert set(two.schema().names) == {"url", "lang"}


def test_flagship_from_parquet_matches_synth(ray_session, pages_path):
    from information_extraction_system_ray.pipelines.flagship import annotate
    from information_extraction_system_ray.sources.pages import (read_pages,
                                                      synth_pages)
    from information_extraction_system_ray.stages.graph import explode_list_struct

    def triples_of(src):
        ann = annotate(src, num_parts=8)
        t = ann.map_batches(
            lambda b: explode_list_struct(b, "triples", ["url"]).select(
                ["url", "subj", "pred", "obj"]),
            batch_format="pyarrow").to_pandas()
        return t.sort_values(["url", "subj", "pred", "obj"]) \
            .reset_index(drop=True)

    a = triples_of(read_pages(pages_path))
    b = triples_of(synth_pages(256))
    assert a.equals(b)


def test_pages_domain_stats_golden(ray_session):
    """pages_domain_stats equals an exact recomputation straight from
    refimpl.pagegen (independent of every Ray kernel in the query)."""
    from urllib.parse import urlparse

    import __ray_entry__ as e
    from information_extraction_system_ray.queries import _n_pages
    from refimpl import SEED
    from refimpl.pagegen import gen_page

    sf = "/root/testdata/sf0.001"
    want = {}
    for i in range(_n_pages(sf)):
        p = gen_page(i, SEED)
        d = urlparse(p.url).netloc
        row = want.setdefault(d, [0, 0, 0, 0, 0])
        row[0] += 1
        row[1] += p.lang == "en"
        row[2] += p.text_provided
        row[3] += len(p.html)
        row[4] += len(p.text) if p.text_provided else 0

    out = e.queries()["pages_domain_stats"](sf).to_pandas()
    got = {r.domain: [r.n_pages, r.n_en, r.n_with_text, r.html_bytes,
                      r.text_chars] for r in out.itertuples()}
    assert got == want
    assert list(out["domain"]) == sorted(want)


def test_pages_link_stats_matches_refimpl(ray_session):
    """pages_link_stats equals a single-process recompute with the same
    href extraction + resolution rules over the same synthesized pages."""
    import re
    from collections import defaultdict

    from information_extraction_system_ray.queries import (
        _n_pages, pages_link_stats)
    from refimpl.pagegen import gen_page

    sf = "/root/testdata/sf0.001"
    got = pages_link_stats(sf).to_pandas().set_index("domain")

    href_re = re.compile(rb'<a\s+href="([^"]*)"')
    n_pages = defaultdict(int)
    n_links = defaultdict(int)
    n_ext = defaultdict(int)
    targets = defaultdict(set)
    for i in range(_n_pages(sf)):
        p = gen_page(i)
        host = p.url.split("://", 1)[1].split("/", 1)[0]
        n_pages[host] += 1
        for m in href_re.findall(p.html):
            href = m.decode()
            n_links[host] += 1
            if href.startswith(("http://", "https://")):
                thost = href.split("://", 1)[1].split("/", 1)[0]
                if thost != host:
                    n_ext[host] += 1
                    continue
                targets[host].add(href)
            elif href.startswith("/"):
                targets[host].add(f"https://{host}{href}")
            else:
                targets[host].add(f"https://{host}/{href}")
    assert set(got.index) == set(n_pages)
    for d in n_pages:
        assert int(got.loc[d, "n_pages"]) == n_pages[d]
        assert int(got.loc[d, "n_links"]) == n_links[d]
        assert int(got.loc[d, "n_external"]) == n_ext[d]
        assert int(got.loc[d, "n_unique_targets"]) == len(targets[d])


def test_avro_codec_roundtrip():
    """sources/avrofile.py: lossless OCF roundtrip over int64 extremes,
    signed zigzag, unicode/long strings, booleans; byte-deterministic;
    non-null codec and bad magic reject."""
    import pyarrow as pa
    import pytest

    from information_extraction_system_ray.sources.avrofile import (
        read_avro, write_avro)

    t = pa.table({
        "a": pa.array([0, 1, -1, 2**62, -2**62, 63, -64], pa.int64()),
        "b": pa.array([0.0, -0.0, 1e300, -1e-300, 2.5, -2.5, 3.0],
                      pa.float64()),
        "s": pa.array(["", "héllo", "x" * 5000, "a\nb", "séno", "t", "u"],
                      pa.string()),
        "f": pa.array([True, False, True, False, True, False, True],
                      pa.bool_())})
    write_avro(t, "/tmp/ies_avro_test.avro", rows_per_block=3)
    assert read_avro("/tmp/ies_avro_test.avro").equals(t)

    write_avro(t, "/tmp/ies_avro_test2.avro", rows_per_block=3)
    assert open("/tmp/ies_avro_test.avro", "rb").read() == \
        open("/tmp/ies_avro_test2.avro", "rb").read()

    with pytest.raises(ValueError):
        read_avro(b"NOPE" + b"\x00" * 32)
    raw = bytearray(open("/tmp/ies_avro_test.avro", "rb").read())
    idx = raw.find(b"null", raw.find(b"avro.codec"))
    raw[idx:idx + 4] = b"defl"           # pretend deflate
    with pytest.raises(ValueError):
        read_avro(bytes(raw))
