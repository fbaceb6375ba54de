"""Line-level corpus dedup (osm_spark/text/lines.py) vs a python oracle."""

from __future__ import annotations

from osm_spark.text.lines import line_dedup, split_lines


def _py_line_dedup(docs: list[tuple[int, str]], sep: str = "\n"):
    seen: set[str] = set()
    out = {}
    for doc_id, text in sorted(docs):  # global (doc_id, line_no) order
        kept = []
        lines = text.split(sep)
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        out[doc_id] = (sep.join(kept), len(lines), len(kept))
    return out


def test_line_dedup_matches_python_oracle(spark):
    docs = [
        (1, "nav\nabout us\nreal content one\nfooter"),
        (2, "nav\nreal content two\nfooter"),
        (3, "nav\nfooter"),                    # fully boilerplate
        (4, "real content one\nfresh line"),   # cross-doc dup + new
        (5, "dup\ndup\ndup"),                  # intra-doc dups
        (6, ""),                               # empty text = one empty line
        (7, "solo"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_lines, r.n_kept)
        for r in line_dedup(df).collect()
    }
    assert got == _py_line_dedup(docs)


def test_line_dedup_keeps_each_distinct_line_exactly_once(spark):
    df = spark.createDataFrame(
        [(i, f"common\nunique {i}") for i in range(20)],
        "doc_id long, text string",
    )
    out = line_dedup(df)
    kept = split_lines(out, text_col="clean_text").where("line != ''")
    lines = [r.line for r in kept.collect()]
    assert sorted(lines) == sorted(set(lines))  # no duplicates survive
    assert "common" in lines and len(lines) == 21


def test_line_dedup_plan_no_sort_merge_or_cartesian(spark):
    df = spark.createDataFrame(
        [(i, f"a\nb {i}") for i in range(50)], "doc_id long, text string"
    )
    plan = line_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # digest join is hash, not re-sort


def test_line_dedup_within_keeps_first_and_order(spark):
    from osm_spark.text.lines import line_dedup_within

    df = spark.createDataFrame(
        [(1, "nav\na\nnav\nb\na\nnav"), (2, "x\ny"), (3, "z\nz\nz")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in line_dedup_within(df).collect()}
    assert got[1]["clean_text"] == "nav\na\nb"
    assert got[1]["n_lines"] == 6 and got[1]["n_kept"] == 3
    assert got[2]["clean_text"] == "x\ny" and got[2]["n_kept"] == 2
    assert got[3]["clean_text"] == "z" and got[3]["n_kept"] == 1


def test_line_dedup_within_is_zero_shuffle(spark):
    from osm_spark.text.lines import line_dedup_within

    df = spark.createDataFrame([(1, "a\nb\na")], "doc_id long, text string")
    plan = line_dedup_within(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
