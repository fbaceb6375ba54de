"""Token-window span dedup vs a straight-line python replay."""

import hashlib

from osm_spark.text.spans import span_dedup, window_digests

W = 4


def _py_span_dedup(corpus: dict[int, str], w: int = W):
    occ = []  # (doc, start, digest)
    toks = {d: t.split(" ") for d, t in corpus.items()}
    for d in sorted(corpus):
        ts = toks[d]
        for s in range(0, len(ts) - w + 1):
            h = hashlib.md5(" ".join(ts[s : s + w]).encode()).hexdigest()
            occ.append((d, s, h))
    first = {}
    for d, s, h in sorted(occ):
        first.setdefault(h, (d, s))
    out = {}
    for d in corpus:
        ts = toks[d]
        dup_starts = [
            s for dd, s, h in occ if dd == d and first[h] != (dd, s)
        ]
        kept = [
            t
            for i, t in enumerate(ts)
            if not any(s <= i < s + w for s in dup_starts)
        ]
        out[d] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


CORPUS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "a quick brown fox jumps over fences daily here",  # shares a 5-run
    3: "the quick brown fox jumps over the lazy dog",  # full copy of 1
    4: "totally unrelated words appear in this one",
    5: "short doc",  # < W tokens: no windows
}


def test_span_dedup_matches_python_replay(spark):
    docs = spark.createDataFrame(
        [(d, t) for d, t in CORPUS.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, r.clean_text)
        for r in span_dedup(docs, w=W).collect()
    }
    assert got == _py_span_dedup(CORPUS)
    # the full copy (doc 3) must be entirely cut, the original kept
    assert got[3][2] == "" and got[1][2] == CORPUS[1]
    # sub-window doc emits nothing duplicated and keeps its text
    assert got[5] == (2, 0, "short doc")


def test_window_digest_count(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y")], "doc_id long, text string"
    )
    rows = window_digests(docs, w=4).collect()
    assert len([r for r in rows if r.doc_id == 1]) == 3  # 6-4+1
    assert len([r for r in rows if r.doc_id == 2]) == 0
