"""Funnel (pipeline/funnel.py) and cohort retention (pipeline/cohorts.py)
vs hand-built sequences with known step/retention structure."""

from __future__ import annotations

import pandas as pd
import pytest

from osm_spark.pipeline.cohorts import cohort_retention
from osm_spark.pipeline.funnel import funnel_counts

T0 = pd.Timestamp("2024-01-01 10:00:00")  # a Monday


def _ev(uid, eid, minutes, etype):
    return {
        "user_id": uid,
        "event_id": eid,
        "ts": T0 + pd.Timedelta(minutes=minutes),
        "event_type": etype,
    }


def test_funnel_order_matters(spark):
    rows = [
        # u1 completes in order
        _ev(1, 1, 0, "view"), _ev(1, 2, 1, "click"), _ev(1, 3, 2, "buy"),
        # u2 has all three types but click BEFORE view: stops at view
        _ev(2, 4, 0, "click"), _ev(2, 5, 1, "view"), _ev(2, 6, 2, "buy"),
        # u3 views only
        _ev(3, 7, 0, "view"),
        # u4 never enters the funnel (other events only)
        _ev(4, 8, 0, "scroll"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {
        r.step_name: r.n_users
        for r in funnel_counts(df, ["view", "click", "buy"]).collect()
    }
    assert got == {"view": 3, "click": 1, "buy": 1}


def test_funnel_same_ts_tie_breaks_on_event_id(spark):
    # view and click share a timestamp; event_id 1 < 2 puts view first,
    # so the funnel completes — flipping the ids must break it
    fwd = [_ev(1, 1, 0, "view"), _ev(1, 2, 0, "click")]
    rev = [_ev(1, 2, 0, "view"), _ev(1, 1, 0, "click")]
    for rows, want_click in [(fwd, 1), (rev, 0)]:
        df = spark.createDataFrame(pd.DataFrame(rows))
        got = {
            r.step_name: r.n_users
            for r in funnel_counts(df, ["view", "click"]).collect()
        }
        assert got["click"] == want_click


def test_funnel_emits_zero_rows_and_validates_steps(spark):
    df = spark.createDataFrame(pd.DataFrame([_ev(1, 1, 0, "view")]))
    got = funnel_counts(df, ["view", "click"]).toPandas()
    assert len(got) == 2  # the empty step still appears, at 0
    assert got.set_index("step_name").n_users.to_dict() == {
        "view": 1, "click": 0,
    }
    with pytest.raises(ValueError):
        funnel_counts(df, [])
    with pytest.raises(ValueError):
        funnel_counts(df, ["view", "view"])


def test_funnel_reuse_of_one_event_forbidden(spark):
    # a single "view" cannot satisfy both steps of view -> view is
    # rejected (distinct), but check a repeated STEP TYPE sequence via
    # two distinct labels mapping to the same semantics is out of scope;
    # instead: step 2 must match an event STRICTLY AFTER step 1's match
    rows = [_ev(1, 1, 0, "view"), _ev(1, 2, 1, "click")]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {
        r.step_name: r.n_users
        for r in funnel_counts(df, ["click", "view"]).collect()
    }
    # click happens AFTER view, so the click -> view funnel stalls
    assert got == {"click": 1, "view": 0}


def test_cohort_retention_triangle(spark):
    wk = 7 * 24 * 60  # minutes per week
    rows = [
        # u1: first seen week 0, active weeks 0, 1, 3
        _ev(1, 1, 0, "view"), _ev(1, 2, wk, "view"), _ev(1, 3, 3 * wk, "view"),
        # u2: first seen week 0, active week 0 only (two events, one week)
        _ev(2, 4, 5, "view"), _ev(2, 5, 10, "view"),
        # u3: first seen week 1, active weeks 1, 2
        _ev(3, 6, wk, "view"), _ev(3, 7, 2 * wk, "view"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {
        (str(r.cohort_week), r.week_offset): r.n_users
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


def test_cohort_week_boundary_is_monday(spark):
    # Sunday and the following Monday land in different cohorts
    rows = [
        _ev(1, 1, 6 * 24 * 60, "view"),  # Sunday 10:00
        _ev(2, 2, 7 * 24 * 60, "view"),  # Monday 10:00
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = cohort_retention(df).toPandas()
    assert set(str(d) for d in got.cohort_week) == {
        "2024-01-01", "2024-01-08",
    }
