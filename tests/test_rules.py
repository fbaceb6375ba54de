"""Gopher quality rules + C4 line cleaning (osm_spark/text/rules.py)."""

from __future__ import annotations

from osm_spark.text.rules import c4_line_filter, gopher_rules

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs back home "
    "to be with all of those friends that have stayed with him for years "
    "while keeping every single promise made along the way during spring"
)  # 50+ words? pad below


def _doc_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _flags(spark, text):
    df = gopher_rules(_doc_df(spark, [(1, text)]))
    return df.collect()[0].asDict()


def test_gopher_keep_on_clean_prose(spark):
    text = " ".join([GOOD] * 2)  # ~100 words, fluent
    got = _flags(spark, text)
    assert got["keep"] is True
    assert all(got[k] for k in got if k.startswith("r_"))


def test_gopher_word_count_bounds(spark):
    got = _flags(spark, "too short")
    assert got["r_word_count"] is False and got["keep"] is False
    assert _flags(spark, "")["n_words"] == 0


def test_gopher_mean_word_len_integer_boundary(spark):
    # 60 words of length exactly 3 -> sum=180=3n: boundary INCLUDED
    assert _flags(spark, " ".join(["the"] * 60))["r_mean_word_len"] is True
    # length-2 words -> sum < 3n: excluded
    assert _flags(spark, " ".join(["to"] * 60))["r_mean_word_len"] is False


def test_gopher_symbol_and_ellipsis_rules(spark):
    base = " ".join([GOOD] * 2)
    spammy = base + " " + " ".join(["#"] * 30)
    assert _flags(spark, spammy)["r_symbol_ratio"] is False
    elly = "\n".join([GOOD + "..."] * 5 + [GOOD] * 5)  # 50% ellipsis lines
    assert _flags(spark, elly)["r_ellipsis_lines"] is False


def test_gopher_bullet_rule(spark):
    bullets = "\n".join(["- item " + GOOD] * 5 + [GOOD] * 5)  # 50% bullets
    assert _flags(spark, bullets)["r_bullet_lines"] is False
    few = "\n".join(["- item"] + [GOOD] * 9)  # 10% bullets: allowed
    assert _flags(spark, few)["r_bullet_lines"] is True


def test_gopher_alpha_and_stopword_rules(spark):
    nums = " ".join([GOOD] + ["123 456 789 000"] * 10)
    assert _flags(spark, nums)["r_alpha_words"] is False
    nostop = " ".join(["alpha beta gamma delta"] * 15)
    assert _flags(spark, nostop)["r_stopwords"] is False
    assert _flags(spark, " ".join([GOOD] * 2))["r_stopwords"] is True


def _line_df(spark, rows):
    return spark.createDataFrame(rows, "page_id long, pos long, line string")


def test_c4_line_rules_and_reassembly(spark):
    rows = [
        (1, 0, "this is a perfectly fine sentence."),
        (1, 1, "no terminal punctuation here so dropped"),
        (1, 2, "lorem ipsum dolor sit amet filler text."),
        (1, 3, "function() { return 1; } code text here."),
        (1, 4, "some javascript is required to view this."),
        (1, 5, "another good sentence stays in the page!"),
        (1, 6, 'a quoted ending also counts as terminal "'),
        (2, 0, "only one good sentence on this page."),
        (2, 1, "short one."),  # < 5 words
    ]
    got = {r["page_id"]: r for r in c4_line_filter(_line_df(spark, rows)).collect()}
    assert got[1]["n_lines_kept"] == 3 and got[1]["kept"] is True
    assert got[1]["text"] == (
        "this is a perfectly fine sentence.\n"
        "another good sentence stays in the page!\n"
        'a quoted ending also counts as terminal "'
    )
    assert got[2]["n_lines_kept"] == 1 and got[2]["kept"] is False


def test_c4_all_dropped_page_still_returns_row(spark):
    rows = [(9, 0, "nope"), (9, 1, "also nope")]
    got = c4_line_filter(_line_df(spark, rows)).collect()[0]
    assert got["text"] == "" and got["n_lines_kept"] == 0 and got["kept"] is False


def test_c4_order_is_pos_not_collect_order(spark):
    rows = [
        (3, 5, "the last line of the page arrives first."),
        (3, 1, "the first line of the page arrives last."),
    ]
    got = c4_line_filter(_line_df(spark, rows)).collect()[0]
    assert got["text"].startswith("the first line")
