"""Unit tests for osm_spark.functions.parsing (SURVEY.md §2.7).

Each case mirrors a reference behavior; expected values come from the
reference's documented semantics, not from running the reference.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from osm_spark.functions import (
    age_months,
    age_years,
    badge_status_decode,
    cost_tbc,
    email_with_name,
    full_name,
    identifier,
    make_datetime,
    money_decimal,
    name_number_split,
    parse_date,
    parse_datetime,
    permission_array,
    phone_normalize,
    sent_at_subject_split,
    strip_html,
    to_i_or_nil,
)


def one_col(spark, values, expr, schema="v string"):
    df = spark.createDataFrame([(v,) for v in values], schema)
    return [r[0] for r in df.select(expr.alias("out")).collect()]


def test_parse_date_dual_format(spark):
    out = one_col(
        spark,
        ["2000-03-08", "08/03/2000", "1970-01-01", "01/01/1970", "garbage", None, ""],
        parse_date("v"),
    )
    d = dt.date(2000, 3, 8)
    assert out == [d, d, None, None, None, None, None]


def test_parse_datetime_strict(spark):
    out = one_col(
        spark,
        ["2014-07-21 12:13:14", "21/07/2014 12:13", "bad"],
        parse_datetime("v"),
    )
    assert out[0] == dt.datetime(2014, 7, 21, 12, 13, 14)
    assert out[1] is None and out[2] is None


def test_make_datetime(spark):
    df = spark.createDataFrame(
        [
            ("2000-01-02", "03:04:05"),
            ("2000-01-02", "3:04"),
            ("2000-01-02", ""),
            ("1970-01-01", "10:00:00"),
            ("", "10:00:00"),
            (None, "10:00:00"),
        ],
        "d string, t string",
    )
    out = [r[0] for r in df.select(make_datetime("d", "t").alias("o")).collect()]
    assert out[0] == dt.datetime(2000, 1, 2, 3, 4, 5)
    assert out[1] == dt.datetime(2000, 1, 2, 3, 4, 0)
    assert out[2] == dt.datetime(2000, 1, 2, 0, 0, 0)
    assert out[3] is None and out[4] is None and out[5] is None


def test_to_i_or_nil(spark):
    out = one_col(spark, ["123", " 42 ", "abc", "", None, "-7"], to_i_or_nil("v"))
    assert out == [123, 42, None, None, None, -7]


def test_money_and_tbc(spark):
    from decimal import Decimal

    out = one_col(spark, ["1.00", "12.34", "-1", "TBC", "1.5", "free"], money_decimal("v"))
    assert out == [Decimal("1.00"), Decimal("12.34"), None, None, None, None]
    out = one_col(spark, ["-1", "TBC", "1.00"], cost_tbc("v"))
    assert out == [True, True, False]


def test_full_name_blank_filtering(spark):
    df = spark.createDataFrame(
        [("A", "B"), ("A", ""), ("", "B"), ("", ""), (None, "B"), ("  ", "B")],
        "f string, l string",
    )
    out = [r[0] for r in df.select(full_name("f", "l").alias("o")).collect()]
    assert out == ["A B", "A", "B", "", "B", "B"]


def test_phone_normalize(spark):
    out = one_col(spark, ["+44 (0)1234-567 890", "01234 567890"], phone_normalize("v"))
    assert out == ["+4401234567890", "01234567890"]


def test_email_with_name(spark):
    df = spark.createDataFrame(
        [("John", "Smith", "j@x.com"), ("", "", "j@x.com"), ("John", "Smith", "")],
        "f string, l string, e string",
    )
    out = [r[0] for r in df.select(email_with_name("f", "l", "e").alias("o")).collect()]
    assert out == ['"John Smith" <j@x.com>', "j@x.com", None]


def test_age_decompose(spark):
    df = spark.createDataFrame([("12 / 00",), ("06 / 11",), ("bad",)], "v string")
    out = df.select(age_years("v").alias("y"), age_months("v").alias("m")).collect()
    assert (out[0].y, out[0].m) == (12, 0)
    assert (out[1].y, out[1].m) == (6, 11)
    assert (out[2].y, out[2].m) == (None, None)


def test_permission_array(spark):
    df = spark.createDataFrame([(10,), (20,), (100,), (0,), (15,)], "v int")
    out = [r[0] for r in df.select(permission_array("v").alias("o")).collect()]
    assert out == [
        ["read"],
        ["read", "write"],
        ["read", "write", "administer"],
        [],
        ["read"],
    ]


def test_badge_status_decode(spark):
    cases = {
        "Started": ("started", None, None),
        "Due": ("due", None, None),
        "Due Lvl 3": ("due", 3, None),
        "Awarded": ("awarded", None, None),
        "Awarded Lvl 2": ("awarded", 2, None),
        "28/02/2016": ("awarded", None, dt.date(2016, 2, 28)),
        "28/02/2016 (Lvl 1)": ("awarded", 1, dt.date(2016, 2, 28)),
    }
    df = spark.createDataFrame([(k,) for k in cases], "v string")
    rows = df.select("v", badge_status_decode("v").alias("o")).collect()
    for row in rows:
        exp = cases[row.v]
        assert (row.o.status, row.o.level, row.o.date) == exp, row.v


def test_name_number_split(spark):
    df = spark.createDataFrame([("John Smith  1234567890",), ("X 42",)], "v string")
    out = [r[0] for r in df.select(name_number_split("v").alias("o")).collect()]
    assert (out[0]["name"], out[0]["number"]) == ("John Smith", "+1234567890")
    assert (out[1]["name"], out[1]["number"]) == ("X", "+42")


def test_sent_at_subject_split(spark):
    df = spark.createDataFrame([("28/02/2016 13:45 - Hello - World",)], "v string")
    out = df.select(sent_at_subject_split("v").alias("o")).collect()[0].o
    assert out.sent_at == dt.datetime(2016, 2, 28, 13, 45)
    assert out.subject == "Hello - World"


def test_strip_html_byte_identical(spark):
    raw = "<p>Hello <b>world</b> &amp; bytes é</p><br/>"
    df = spark.createDataFrame([(raw,)], "v string")
    out = df.select(strip_html("v").alias("o")).collect()[0].o
    # Reference regex removes tags only — entities and unicode untouched.
    assert out == "Hello world &amp; bytes é"
    # Idempotent → stable byte-identical invariant.
    df2 = spark.createDataFrame([(out,)], "v string")
    assert df2.select(strip_html("v").alias("o")).collect()[0].o == out


def test_identifier(spark):
    df = spark.createDataFrame([(123, 1)], "i long, c int")
    assert df.select(identifier("i", "c").alias("o")).collect()[0].o == "123_1"


def test_audit_trail_parse_truth_table(spark):
    """Mirrors spec/osm/event_spec.rb audit cases (event.rb:889-897):
    detail rows split on the greedy named groups (quotes inside label and
    value survive), attendance display strings decode to symbols, unknown
    displays and other row types yield NULLs."""
    from osm_spark.functions import audit_trail_parse

    rows = [
        ("detail", "Set 'First name' to 'John'", ("First name", "John", None)),
        ("detail", "Set 'Nick's label' to 'O'Brien'", ("Nick's label", "O'Brien", None)),
        ("detail", "garbage text", (None, None, None)),
        ("attendance", "Attendance: Yes", (None, None, "yes")),
        ("attendance", "Attendance: Show in My.SCOUT", (None, None, "shown")),
        ("attendance", "Attendance: Reserved", (None, None, "reserved")),
        ("attendance", "Attendance: Maybe", (None, None, None)),  # unknown display
        ("note", "Set 'x' to 'y'", (None, None, None)),  # wrong type
    ]
    df = spark.createDataFrame(
        [(t, d) for t, d, _ in rows], "typ string, descr string"
    )
    p = audit_trail_parse("typ", "descr")
    got = [
        (r.out.label, r.out.value, r.out.attendance)
        for r in df.select(p.alias("out")).collect()
    ]
    assert got == [exp for _, _, exp in rows]


def test_template_tag_present(spark):
    from osm_spark.functions import template_tag_present

    df = spark.createDataFrame(
        [("Hi [FIRSTNAME], see [EVENT]",), ("Hi FIRSTNAME",), ("",)],
        "content string",
    )
    got = [
        r[0]
        for r in df.select(
            template_tag_present("content", F.lit("FIRSTNAME")).alias("x")
        ).collect()
    ]
    assert got == [True, False, False]


def test_credits_remaining_regex(spark):
    """sms.rb:30 shape: the single digit run inside a human string; two
    digit runs or none -> NULL (the reference regex anchors both ends)."""
    from osm_spark.functions import credits_remaining

    vals = ["You have 45 credits remaining", "45", "no credits",
            "12 of 34 left", " 7 ."]
    got = one_col(spark, vals, credits_remaining(F.col("v")))
    assert got == [45, 45, None, None, 7]
