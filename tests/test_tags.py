"""Tag-map semantics tests — ports the reference's hardest truth tables.

requirement_met truth table: spec/osm/badge_spec.rb:217-227.
Key-regex map splits: flexi_record.rb:98-100, event.rb:420-423.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from osm_spark.functions import (
    core_custom_split,
    date_keyed_map,
    key_pattern_filter,
    requirement_met,
    transform_int_keys,
)

# Verbatim truth table from spec/osm/badge_spec.rb:217-227 (plus NULL).
MET_CASES = [
    ("y", True),
    ("yes", True),
    ("Yes", True),
    ("1", True),
    ("9", True),
    ("x", False),
    ("X", False),
    ("xNo", False),
    ("0", False),
    ("", False),
    ("   ", False),
    (None, False),
]


def test_requirement_met_truth_table(spark):
    df = spark.createDataFrame([(v,) for v, _ in MET_CASES], "v string")
    out = [r[0] for r in df.select(requirement_met("v").alias("o")).collect()]
    assert out == [e for _, e in MET_CASES]


def test_key_pattern_filter_split(spark):
    m = {"f_1": "a", "f_22": "b", "p1": "pay", "firstname": "Jo"}
    df = spark.createDataFrame([(m,)], "m map<string,string>")
    fields = df.select(key_pattern_filter("m", r"^f_\d+$").alias("o")).collect()[0].o
    assert fields == {"f_1": "a", "f_22": "b"}
    pays = df.select(key_pattern_filter("m", r"^p\d+$").alias("o")).collect()[0].o
    assert pays == {"p1": "pay"}
    rest = df.select(
        key_pattern_filter(key_pattern_filter("m", r"^f_\d+$", keep=False), r"^p\d+$", keep=False)
        .alias("o")
    ).collect()[0].o
    assert rest == {"firstname": "Jo"}


def test_core_custom_split(spark):
    m = {"1": "core-a", "2": "core-b", "8441": "custom"}
    df = spark.createDataFrame([(m,)], "m map<string,string>")
    core, custom = core_custom_split("m", ["1", "2"])
    row = df.select(core.alias("core"), custom.alias("custom")).collect()[0]
    assert row.core == {"1": "core-a", "2": "core-b"}
    assert row.custom == {"8441": "custom"}


def test_transform_int_keys(spark):
    m = {"12": "a", "007": "b", "nan": "c"}
    df = spark.createDataFrame([(m,)], "m map<string,string>")
    out = df.select(transform_int_keys("m").alias("o")).collect()[0].o
    assert out == {12: "a", 7: "b"}


def test_date_keyed_map(spark):
    m = {"2000-01-02": "Yes", "total": "4", "2000-01-09": "No"}
    df = spark.createDataFrame([(m,)], "m map<string,string>")
    out = df.select(date_keyed_map("m").alias("o")).collect()[0].o
    got = sorted([(e.date, e.value) for e in out])
    assert got == [(dt.date(2000, 1, 2), "Yes"), (dt.date(2000, 1, 9), "No")]
