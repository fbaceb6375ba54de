"""PII redaction over web text — sequential pattern scrub + counts.

Patterns are deliberately restricted to syntax that Java regex (Spark)
and RE2 (DuckDB, Go scanners) interpret identically — no lookarounds,
no backreferences, ASCII classes only — so the operator is
oracle-checkable and portable to any engine in the pipeline.

The scrub is SEQUENTIAL and each count is taken on the text as it
stands at that step (emails first, then IPs, then phone-style numbers):
overlapping matches are attributed to exactly one category, the same
one in every engine, which keeps the output deterministic.

Everything is pure Column regexp work — whole-stage codegen, no UDF;
at 100 TB this is a map-only pass that pushes nothing and shuffles
nothing.

Reference parity: the reference normalizes phone numbers and splits
contact fields with the same regex-chain style (lib/osm/member.rb
contact model; SURVEY.md §2.7 F9/F10) — this operator is that layer
pointed at privacy scrubbing instead of formatting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java-regex / RE2 common-dialect patterns (keep in sync with the
# oracle SQL in __spark_entry__.py).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# International-prefix form only ("+" then 8+ digits/separators): local
# forms are ambiguous with plain numbers and belong to a learned model,
# not a regex.
PHONE_RE = r"\+[0-9][0-9 ()-]{6,}[0-9]"

_STEPS = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, redacted_fp, text_redacted).

    ``redacted_fp`` is the md5 of the scrubbed text — the hash-stable
    witness the oracle compares (and the content id downstream exact
    dedup would use post-scrub).
    """
    cur = F.col(text_col)
    counts = {}
    for name, pat, token in _STEPS:
        counts[name] = F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        cur = F.regexp_replace(cur, pat, token)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        counts["email"].alias("n_emails"),
        counts["ip"].alias("n_ips"),
        counts["phone"].alias("n_phones"),
        F.md5(cur).alias("redacted_fp"),
        cur.alias("text_redacted"),
    )
