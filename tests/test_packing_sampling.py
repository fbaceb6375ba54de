"""Packing, sampling, redaction and repetition operators vs pure-Python
oracles (the reference's truth-table test style, spec/osm/*_spec.rb)."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from osm_spark.text.packing import global_cumsum, pack_sequences
from osm_spark.text.redact import EMAIL_RE, IPV4_RE, PHONE_RE, redact_pii
from osm_spark.text.sampling import hash_sample, quota_sample, sample_threshold


@pytest.fixture(scope="module")
def docs(spark, sf_small_dir):
    return spark.read.parquet(f"{sf_small_dir}/documents.parquet").cache()


# ---------------------------------------------------------------------------
# global prefix sum + packing
# ---------------------------------------------------------------------------


def test_global_cumsum_exact_and_bucket_invariant(spark):
    # skewed values: a few huge rows among many small ones
    rows = [(i, (1000 if i % 17 == 0 else i % 5)) for i in range(1, 401)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    want = {}
    acc = 0
    for k, v in sorted(rows):
        acc += v
        want[k] = acc
    for nb in (1, 3, 16):
        got = {
            r.k: r.cum
            for r in global_cumsum(df, "k", "v", num_buckets=nb).collect()
        }
        assert got == want, f"num_buckets={nb}"


def test_global_cumsum_plan_has_no_single_partition_window(spark):
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(1, 200)], "k long, v long"
    )
    plan = (
        global_cumsum(df, "k", "v", num_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # a naive global window would plan Exchange SinglePartition under the
    # sort — the whole point of the two-phase prefix sum is its absence
    assert "SinglePartition" not in plan, plan


def test_pack_sequences_python_oracle(docs):
    budget = 64
    got = {
        r.doc_id: (r.n_tok, r.cum_tokens, r.pack_id, r.pack_offset, r.n_packs_spanned)
        for r in pack_sequences(docs, budget).collect()
    }
    pdocs = {r.doc_id: r.text for r in docs.collect()}
    acc = 0
    for did in sorted(pdocs):
        n = len(pdocs[did].split(" "))
        start, acc = acc, acc + n
        pack, off = start // budget, start % budget
        spanned = ((acc - 1) // budget - pack + 1) if n > 0 else 1
        assert got[did] == (n, acc, pack, off, spanned), did
    # structural invariant: offsets stay inside the budget
    assert all(0 <= v[3] < budget for v in got.values())


def test_pack_sequences_rejects_bad_budget(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def test_sample_threshold_values():
    assert sample_threshold(0.25) == "40000000" + "0" * 24
    assert sample_threshold(0.0) == "0" * 32
    assert sample_threshold(1.0) > "f" * 32
    with pytest.raises(ValueError):
        sample_threshold(1.5)


def test_hash_sample_matches_python_and_nests(docs):
    pids = {r.doc_id for r in docs.select("doc_id").collect()}

    def py_sample(frac):
        thr = sample_threshold(frac)
        return {
            i
            for i in pids
            if hashlib.md5(f"s1:{i}".encode()).hexdigest() < thr
        }

    s10 = {r.doc_id for r in hash_sample(docs, "doc_id", 0.10).collect()}
    s25 = {r.doc_id for r in hash_sample(docs, "doc_id", 0.25).collect()}
    assert s10 == py_sample(0.10)
    assert s25 == py_sample(0.25)
    # thresholds are prefixes of one keyspace: smaller fraction nests
    # inside larger — stable sample growth, no membership churn
    assert s10 <= s25
    # a different salt draws an independent sample
    other = {r.doc_id for r in hash_sample(docs, "doc_id", 0.25, salt="x").collect()}
    assert other != s25


def test_mixture_sample_membership_and_default(docs):
    from osm_spark.text.sampling import mixture_sample

    srcs = sorted({r.source for r in docs.select("source").distinct().collect()})
    assert len(srcs) >= 3
    weights = {srcs[0]: 1.0, srcs[1]: 0.5}  # others -> default 0.0
    kept = {
        (r.doc_id, r.source)
        for r in mixture_sample(docs, "source", weights, "doc_id").collect()
    }
    # python replication
    want = set()
    for r in docs.select("doc_id", "source").collect():
        f = weights.get(r.source, 0.0)
        if hashlib.md5(f"s1:{r.doc_id}".encode()).hexdigest() < sample_threshold(f):
            want.add((r.doc_id, r.source))
    assert kept == want
    # weight 1.0 keeps the whole group; absent groups drop entirely
    n_src0 = docs.filter(F.col("source") == srcs[0]).count()
    assert sum(1 for _, s in kept if s == srcs[0]) == n_src0
    assert all(s in (srcs[0], srcs[1]) for _, s in kept)
    # raising a group's weight only ADDS members (nested thresholds)
    kept2 = {
        (r.doc_id, r.source)
        for r in mixture_sample(
            docs, "source", {**weights, srcs[1]: 0.9}, "doc_id"
        ).collect()
    }
    assert kept <= kept2


def test_quota_sample_caps_and_is_partitioning_invariant(docs):
    out = quota_sample(docs, "source", 5, "doc_id").select(
        "doc_id", "source", "rk"
    )
    rows = {(r.doc_id, r.source, r.rk) for r in out.collect()}
    per_group: dict[str, int] = {}
    for _, src, rk in rows:
        per_group[src] = max(per_group.get(src, 0), rk)
    assert all(v <= 5 for v in per_group.values())
    # same membership after an adversarial repartition
    rows2 = {
        (r.doc_id, r.source, r.rk)
        for r in quota_sample(docs.repartition(13), "source", 5, "doc_id")
        .select("doc_id", "source", "rk")
        .collect()
    }
    assert rows2 == rows
    # python oracle for one group
    src0 = sorted({s for _, s, _ in rows})[0]
    g = sorted(
        (hashlib.md5(f"s1:{r.doc_id}".encode()).hexdigest(), r.doc_id)
        for r in docs.filter(F.col("source") == src0).collect()
    )[:5]
    want = {(d, src0, i + 1) for i, (_, d) in enumerate(g)}
    assert {t for t in rows if t[1] == src0} == want


# ---------------------------------------------------------------------------
# redaction
# ---------------------------------------------------------------------------


def test_redact_pii_truth_table(spark):
    cases = [
        # (text, n_emails, n_ips, n_phones, redacted)
        ("mail me at bob.smith+x@ex-ample.co.uk now",
         1, 0, 0, "mail me at <EMAIL> now"),
        ("server 10.0.255.3 and 192.168.1.1 up",
         0, 2, 0, "server <IP> and <IP> up"),
        ("call +44 (0)20-7946 0958 today",
         0, 0, 1, "call <PHONE> today"),
        # sequential attribution: the email pass eats the whole address
        # (its +digits local part included) before the phone pass runs
        ("+15551234567@sms.example.com then 5.6.7.8",
         1, 1, 0, "<EMAIL> then <IP>"),
        ("no pii here", 0, 0, 0, "no pii here"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_ ) in enumerate(cases)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in redact_pii(df).collect()}
    for i, (text, ne, ni, np_, red) in enumerate(cases):
        r = got[i]
        assert (r.n_emails, r.n_ips, r.n_phones) == (ne, ni, np_), text
        assert r.text_redacted == red, text
        assert r.redacted_fp == hashlib.md5(red.encode()).hexdigest()


def test_redact_oracle_sql_parity_on_crafted_pii(spark, tmp_path):
    """Run the ACTUAL oracle_sql()['redact_pii'] through DuckDB against
    the Spark operator on a crafted corpus that contains every PII
    category — the driver testdata has none, so without this fixture an
    oracle-side regex corruption (e.g. '\\b' escape-processed to a
    backspace in a non-raw Python string) passes the gate silently."""
    import duckdb

    import __spark_entry__ as entry

    rows = [
        (1, "mail a@b.co and c.d+x@e-f.org now"),
        (2, "hosts 10.0.0.1 8.8.8.8 and 256.1.1.1 too"),
        (3, "ring +44 20 7946 0958 or +1 (555) 000-1111"),
        (4, "mixed a@b.co 1.2.3.4 +49 89 123456 end"),
        (5, "clean text only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    parquet = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(parquet)
    from osm_spark.text.redact import redact_pii

    got = sorted(
        (r.doc_id, r.n_emails, r.n_ips, r.n_phones, r.redacted_fp)
        for r in redact_pii(df)
        .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted_fp")
        .collect()
    )
    # sanity: the fixture actually exercises every category
    assert sum(g[1] for g in got) >= 3 and sum(g[2] for g in got) >= 4
    assert sum(g[3] for g in got) >= 3
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{parquet}/*.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.sql(entry.oracle_sql()["redact_pii"]).fetchall()
    )
    assert got == want


def test_redact_patterns_java_python_agree():
    # the same strings through Python's re (a third dialect) — guards the
    # common-dialect claim the oracle relies on
    s = "x a@b.co 1.2.3.4 +1 (555) 123-4567 y"
    assert len(re.findall(EMAIL_RE, s)) == 1
    t = re.sub(EMAIL_RE, "<EMAIL>", s)
    assert len(re.findall(IPV4_RE, t)) == 1
    t = re.sub(IPV4_RE, "<IP>", t)
    assert len(re.findall(PHONE_RE, t)) == 1


# ---------------------------------------------------------------------------
# repetition
# ---------------------------------------------------------------------------


def test_repetition_stats_truth_table(spark):
    from osm_spark.text.analysis import repetition_stats

    cases = [
        ("a b c d e", 3, 3, 0.0),          # no repeats
        ("a b a b a b a b", 6, 2, 0.666667),  # one looping phrase
        ("a b", 0, 0, 0.0),                # too short for a 3-gram
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_rest) in enumerate(cases)],
        "doc_id long, text string",
    )
    total, distinct, ratio = repetition_stats("text", 3)
    got = {
        r.doc_id: (r.t, r.d, r.r)
        for r in df.select(
            "doc_id", total.alias("t"), distinct.alias("d"), ratio.alias("r")
        ).collect()
    }
    for i, (_, t, d, r) in enumerate(cases):
        assert got[i] == (t, d, r), cases[i]
