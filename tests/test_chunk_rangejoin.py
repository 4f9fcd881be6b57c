"""Chunking (offset-exact text windows) and range-join (vs brute force)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_chunk_text_offsets(ray_session):
    """chunk_text is sliced on source-byte offsets: its token list equals
    the doc's token slice [80i : 80i+100]; neighbours share exactly the
    20-token overlap; token counts match the window arithmetic."""
    import ray.data as rd

    from information_extraction_system_ray.functions.chunk import \
        chunk_documents
    from information_extraction_system_ray.functions.text import _WORD_RE

    rng = np.random.default_rng(3)
    rows = []
    for i, n in enumerate([0, 1, 99, 100, 101, 180, 181, 437]):
        words = [f"tok{j}x{rng.integers(10)}" for j in range(n)]
        # irregular whitespace: offsets must be byte-true, not join-based
        sep = ["  ", " ", "\n", "\t "] * (n + 1)
        text = "".join(w + sep[j] for j, w in enumerate(words)).rstrip()
        rows.append({"doc_id": i, "text": text})

    out = chunk_documents(rd.from_items(rows), size=100, overlap=20) \
        .to_pandas().sort_values(["doc_id", "chunk_id"])

    by_doc = {r["doc_id"]: _WORD_RE.findall(r["text"]) for r in rows}
    assert 0 not in set(out["doc_id"])          # empty doc → no chunks
    for _, row in out.iterrows():
        toks = by_doc[row["doc_id"]]
        start = 80 * row["chunk_id"]
        want = toks[start:start + 100]
        assert _WORD_RE.findall(row["chunk_text"]) == want
        assert row["n_tokens"] == len(want)
    # per-doc chunk counts
    got_counts = out.groupby("doc_id").size().to_dict()
    for did, toks in by_doc.items():
        n = len(toks)
        want_c = 0 if n == 0 else (1 if n <= 100 else -(-(n - 100) // 80) + 1)
        assert got_counts.get(did, 0) == want_c, (did, n)


def test_range_join_count_vs_bruteforce(ray_session):
    import ray.data as rd

    from information_extraction_system_ray.functions.rangejoin import \
        range_join_count

    rng = np.random.default_rng(9)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "lid": np.arange(60, dtype=np.int64),
        "k": rng.integers(0, 8, 60).astype(np.int64),
        "lts": [base + pd.Timedelta(hours=int(h))
                for h in rng.integers(0, 500, 60)],
    })
    right = pd.DataFrame({
        "rk": rng.integers(0, 10, 300).astype(np.int64),  # some keys absent
        "rts": [base + pd.Timedelta(hours=int(h))
                for h in rng.integers(0, 500, 300)],
    })
    lo, hi = pd.Timedelta(hours=-24), pd.Timedelta(hours=48)

    out = range_join_count(
        rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
        rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
        left_by="k", right_by="rk", left_ts="lts", right_ts="rts",
        lo=lo, hi=hi, count_col="n").to_pandas().sort_values("lid")

    assert len(out) == len(left)                 # left-join semantics
    assert out["n"].dtype == np.int64
    for _, row in out.iterrows():
        m = right[(right["rk"] == row["k"])
                  & (right["rts"] >= row["lts"] + lo)
                  & (right["rts"] < row["lts"] + hi)]
        assert row["n"] == len(m), int(row["lid"])
