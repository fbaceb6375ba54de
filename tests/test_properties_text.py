"""Property/fuzz tests for the text-pipeline operators.

Same philosophy as test_properties.py (generated-input truth tables,
the reference's spec style): the pure math is hypothesis-tested in
Python; the Spark operators are fuzzed against an independent Python
replication over one adversarial corpus per test (one Spark job, not
one per example).
"""

from __future__ import annotations

import hashlib
import itertools
import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from osm_spark.text.sampling import sample_threshold

# ---------------------------------------------------------------------------
# sample_threshold — pure math
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    f1=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    f2=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_sample_threshold_monotone_and_nesting(f1, f2):
    t1, t2 = sample_threshold(f1), sample_threshold(f2)
    # monotone thresholds <=> nested samples for any key population
    if f1 <= f2:
        assert t1 <= t2
    else:
        assert t2 <= t1
    # a digest is 32 lowercase hex chars; thresholds must compare
    # correctly against that space
    for t in (t1, t2):
        assert len(t) == 32
        assert t > "" and (t <= "f" * 32 or t == "g" * 32)


@settings(max_examples=200, deadline=None)
@given(f=st.floats(min_value=0.001, max_value=0.999, allow_nan=False))
def test_sample_threshold_fraction_precision(f):
    """The kept fraction of the uniform digest space differs from f by
    at most one prefix quantum (16^-8)."""
    t = sample_threshold(f)
    kept = int(t[:8], 16) / 16**8
    assert abs(kept - f) <= 16**-8 + 1e-12


# ---------------------------------------------------------------------------
# redact_pii — dialect fuzz: Spark (Java regex) vs Python re replication
# ---------------------------------------------------------------------------


def _py_redact(text: str):
    from osm_spark.text.redact import _STEPS

    counts = []
    cur = text
    for _name, pat, token in _STEPS:
        counts.append(len(re.findall(pat, cur)))
        cur = re.sub(pat, token, cur)
    return (*counts, cur)


def test_redact_dialect_fuzz_grid(spark):
    """~300 adversarial concatenations (PII fragments, near-misses,
    boundary abuse) through the Spark operator vs an independent Python
    `re` replication of the same sequential pipeline — the common-dialect
    claim, fuzzed. One Spark job total."""
    frags = [
        "a@b.co",
        "+15551234567@sms.example.com",
        "x.y+z@e-f.org",
        "a@b",               # no TLD — not an email
        "10.0.0.1",
        "1.2.3.4.5.6.7.8",   # two IPs in one run
        "999.999.999.999",   # syntactically an IP by this grammar
        "1.2.3.4567",        # not an IP (no boundary)
        "+44 20 7946 0958",
        "+1 (555) 000-1111",
        "+12",               # too short for a phone
        "555-1234",          # no + prefix — not matched by design
        "plain words",
        "",
    ]
    seps = ["", " ", ".", ",", "x", "0"]
    cases = []
    for (a, b), sep in itertools.product(
        itertools.combinations(frags, 2), seps[:3]
    ):
        cases.append(a + sep + b)
    for f, sep in itertools.product(frags, seps):
        cases.append(sep + f + sep)
    cases = sorted(set(cases))
    assert len(cases) >= 250

    from osm_spark.text.redact import redact_pii

    df = spark.createDataFrame(
        list(enumerate(cases)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_emails, r.n_ips, r.n_phones, r.text_redacted)
        for r in redact_pii(df).collect()
    }
    bad = []
    for i, text in enumerate(cases):
        ne, ni, np_, red = _py_redact(text)
        if got[i] != (ne, ni, np_, red):
            bad.append((text, got[i], (ne, ni, np_, red)))
    assert not bad, bad[:5]


# ---------------------------------------------------------------------------
# pack_sequences — adversarial token counts through the Spark operator
# ---------------------------------------------------------------------------


def test_pack_sequences_adversarial_token_counts(spark):
    """Zero-token docs, exact-budget docs, giant multi-pack docs and a
    budget-1 run — against a Python replication of the layout."""
    from osm_spark.text.packing import pack_sequences

    budget = 100
    # (doc_id, n_tok): zeros, boundary hits, giants, ordinary
    toks = {
        1: 0, 2: 100, 3: 0, 4: 1, 5: 99, 6: 1000, 7: 0, 8: 100,
        9: 37, 10: 263, 11: 0, 12: 1,
    }
    df = spark.createDataFrame(
        [(k, "w") for k in toks], "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.n_tok, r.cum_tokens, r.pack_id, r.pack_offset, r.n_packs_spanned)
        for r in pack_sequences(
            df,
            budget,
            token_count=F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in toks.items() for x in kv]
                ),
                F.col("doc_id").cast("int"),
            ).cast("long"),
        ).collect()
    }
    acc = 0
    for did in sorted(toks):
        n = toks[did]
        start, acc = acc, acc + n
        pack, off = start // budget, start % budget
        spanned = ((acc - 1) // budget - pack + 1) if n > 0 else 1
        assert out[did] == (n, acc, pack, off, spanned), (did, out[did])
    # global conservation: the last cumulative equals the token total
    assert max(v[1] for v in out.values()) == sum(toks.values())
    # budget=1: every token its own pack
    one = {
        r.doc_id: (r.pack_id, r.n_packs_spanned)
        for r in pack_sequences(df.filter(F.col("doc_id") <= 2), 1).collect()
    }
    # default token_count = whitespace split => "w" is 1 token per doc
    assert one[1] == (0, 1) and one[2] == (1, 1)


# ---------------------------------------------------------------------------
# quota/hash sample — salt independence fuzz (pure python oracle math)
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    key=st.integers(min_value=0, max_value=10**12),
    frac=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_hash_sample_membership_formula(key, frac):
    """The engine predicate md5(salt:key) < threshold, replicated in
    Python, keeps/excludes consistently with the threshold construction
    (the Spark/DuckDB twin of this exact comparison is gate-verified)."""
    digest = hashlib.md5(f"s1:{key}".encode()).hexdigest()
    kept = digest < sample_threshold(frac)
    if frac == 0.0:
        assert not kept
    if frac == 1.0:
        assert kept
