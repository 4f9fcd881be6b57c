import hashlib
import os

import pyarrow.parquet as pq

from refimpl.htmlstrip import strip_html, strip_html_str
from refimpl.pagegen import gen_page


def test_strip_policy_basics():
    assert strip_html(b"<p>a  b</p><p>c</p>") == "a b\nc"
    assert strip_html(b"<script>x<y</script>ok") == "ok"
    assert strip_html(b"<nav>menu</nav><div>body &amp; soul</div>") == \
        "body & soul"
    assert strip_html(b"<!-- hidden -->vis<br>ible") == "vis\nible"
    assert strip_html("caf&#233; &#x41;".encode()) == "café A"


def test_strip_is_deterministic_and_idempotent_on_corpus():
    for i in range(40):
        p = gen_page(i)
        t1 = strip_html(p.html)
        assert t1 == p.text
        assert strip_html_str(t1) == t1  # stripping plain text is identity


def test_gold_extracted_fixture_sha(fixdir):
    t = pq.read_table(os.path.join(fixdir, "gold_extracted_tiny.parquet"))
    for row in t.to_pylist():
        assert hashlib.sha256(row["text"].encode()).digest() == \
            row["text_sha256"]
