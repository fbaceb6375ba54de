"""Document chunking (text/chunking.py): window math, round-trip
byte-identity at stride==size, overlap consistency, null/empty policy,
and a zero-shuffle plan assertion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_spark.text.chunking import chunk_documents


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_window_math(spark):
    rows = [(1, "a b c d e f g")]  # 7 tokens
    got = sorted(
        (r.chunk_id, r.start, r.n_tokens, r.chunk)
        for r in chunk_documents(_df(spark, rows), size=4, stride=3).collect()
    )
    assert got == [
        (0, 0, 4, "a b c d"),
        (1, 3, 4, "d e f g"),
        (2, 6, 1, "g"),
    ]


def test_round_trip_byte_identity(spark):
    # stride == size partitions exactly; re-joining chunks with ' '
    # reproduces the original text byte-for-byte, INCLUDING the double
    # space (empty token) in doc 2.
    rows = [(1, "x y z w v"), (2, "a  b c"), (3, "single")]
    chunks = chunk_documents(_df(spark, rows), size=2, stride=2)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "chunk"))
                ).getField("chunk"),
                " ",
            ).alias("text")
        )
    )
    got = {r.doc_id: r.text for r in rebuilt.collect()}
    assert got == {d: t for d, t in rows}


def test_overlap_consistency(spark):
    # With stride < size, each window's head repeats the previous
    # window's tail — check on a longer doc.
    text = " ".join(f"t{i}" for i in range(40))
    out = {
        r.chunk_id: r.chunk.split(" ")
        for r in chunk_documents(_df(spark, [(1, text)]), size=8, stride=5).collect()
    }
    for cid in range(1, len(out)):
        prev, cur = out[cid - 1], out[cid]
        overlap = 8 - 5
        if len(prev) == 8 and len(cur) >= overlap:
            assert prev[-overlap:] == cur[:overlap]


def test_null_and_empty_policy(spark):
    rows = [(1, None), (2, "")]
    got = chunk_documents(_df(spark, rows), size=3, stride=3).collect()
    assert len(got) == 1
    assert got[0].doc_id == 2 and got[0].chunk == "" and got[0].n_tokens == 1


def test_validation(spark):
    df = _df(spark, [(1, "x")])
    with pytest.raises(ValueError):
        chunk_documents(df, size=0)
    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)


def test_zero_shuffle_plan(spark):
    df = _df(spark, [(1, "a b c")])
    plan = (
        chunk_documents(df, size=2, stride=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
