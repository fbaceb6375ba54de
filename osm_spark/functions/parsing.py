"""Parsing / typing scalar functions (SURVEY.md §2.7).

Each function mirrors one reference semantic (cited ``file:line`` into
``/root/reference``) as a pure Column expression. All failure paths return
NULL (the reference returns ``nil``), implemented with ``try_*`` variants so
behavior is identical whether or not the session runs in ANSI mode.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference treats the Unix epoch date as "no value" (lib/osm.rb:169-171).
EPOCH_DATE = "1970-01-01"

# Permission bit decode (lib/osm.rb:151-167, lib/osm/api_access.rb:42-46).
_PERMISSION_LEVELS: list[tuple[int, list[str]]] = [
    (100, ["read", "write", "administer"]),
    (20, ["read", "write"]),
    (10, ["read"]),
]


def epoch_date(col: Column | str) -> Column:
    """True when the value is the epoch sentinel (lib/osm.rb:169-171)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string").startswith(EPOCH_DATE)


def parse_date(col: Column | str) -> Column:
    """Dual-format date parse with epoch→NULL (lib/osm.rb:123-130).

    ``%Y-%m-%d`` when the string contains '-', else ``%d/%m/%Y``; the epoch
    date and unparseable input map to NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.when(
        c.contains("-"), F.try_to_timestamp(c, F.lit("yyyy-MM-dd")).cast("date")
    ).otherwise(F.try_to_timestamp(c, F.lit("dd/MM/yyyy")).cast("date"))
    return F.when(parsed == F.lit(EPOCH_DATE).cast("date"), F.lit(None).cast("date")).otherwise(
        parsed
    )


def parse_datetime(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Strict timestamp parse, NULL on failure (lib/osm.rb:113-120)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt))


def make_datetime(
    date_col: Column | str,
    time_col: Column | str,
    date_fmt: str = "yyyy-MM-dd",
) -> Column:
    """Concat-parse date + time into a timestamp (lib/osm.rb:93-111).

    NULL when the date is blank/epoch/unparseable. A blank or missing time
    yields midnight (the reference passes the bare date to strptime).
    """
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    t = F.col(time_col) if isinstance(time_col, str) else time_col
    t = F.when(F.trim(t) == "", F.lit(None)).otherwise(F.trim(t))
    # Normalize H:M and H:M:S time shapes the API emits (event.rb:881).
    t_norm = F.when(
        t.rlike(r"^\d{1,2}:\d{2}$"), F.concat(t, F.lit(":00"))
    ).otherwise(t)
    base = F.when(
        t_norm.isNull(),
        F.try_to_timestamp(d, F.lit(date_fmt)),
    ).otherwise(
        F.try_to_timestamp(
            F.concat_ws(" ", d, t_norm), F.lit(date_fmt + " H:mm:ss")
        )
    )
    return F.when(
        (d.isNull()) | (F.trim(d) == "") | d.startswith(EPOCH_DATE), F.lit(None).cast("timestamp")
    ).otherwise(base)


def to_i_or_nil(col: Column | str) -> Column:
    """Best-effort integer cast, NULL on failure (lib/osm.rb:132-139)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(c.cast("string")).try_cast("long")


def money_decimal(col: Column | str) -> Column:
    """Money string → decimal(12,2); 'TBC'/'-1' sentinels → NULL.

    The reference keeps money as a ``\\d+\\.\\d{2}`` string with ``-1``
    meaning "to be confirmed" (lib/osm/event.rb:59,95,531; invoice.rb:306).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.rlike(r"^\d+\.\d{2}$"), c.cast("decimal(12,2)")
    ).otherwise(F.lit(None).cast("decimal(12,2)"))


def cost_tbc(col: Column | str) -> Column:
    """True when cost is the TBC sentinel (raw '-1' or 'TBC'), event.rb:482-487."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isin("-1", "TBC")


def full_name(first: Column | str, last: Column | str, sep: str = " ") -> Column:
    """Join non-blank first/last names (lib/osm/member.rb:426-428,667-669)."""
    f = F.col(first) if isinstance(first, str) else first
    l = F.col(last) if isinstance(last, str) else last
    return F.concat_ws(sep, F.nullif(F.trim(F.coalesce(f, F.lit(""))), F.lit("")),
                       F.nullif(F.trim(F.coalesce(l, F.lit(""))), F.lit("")))


def phone_normalize(col: Column | str) -> Column:
    """Strip everything but digits and '+' (lib/osm/member.rb:610-612)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[^\d\+]", "")


def email_with_name(
    first: Column | str, last: Column | str, email: Column | str
) -> Column:
    """'"First Last" <email>' format, NULL on blank email (member.rb:578-581)."""
    e = F.col(email) if isinstance(email, str) else email
    name = full_name(first, last)
    formatted = F.when(
        F.length(name) > 0, F.format_string('"%s" <%s>', name, e)
    ).otherwise(e)
    return F.when(e.isNull() | (F.trim(e) == ""), F.lit(None).cast("string")).otherwise(formatted)


def age_years(col: Column | str) -> Column:
    """Years component of the 'yy / mm' age string (member.rb:413-416)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"^(\d+)\s*/\s*(\d+)$", 1).try_cast("int")


def age_months(col: Column | str) -> Column:
    """Months component of the 'yy / mm' age string (member.rb:418-421)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"^(\d+)\s*/\s*(\d+)$", 2).try_cast("int")


def permission_array(level: Column | str) -> Column:
    """Permission int → array of grants (lib/osm.rb:151-167).

    10 → [read]; 20 → [read, write]; 100 → [read, write, administer];
    anything else → empty array.
    """
    c = F.col(level) if isinstance(level, str) else level
    expr = None
    for threshold, grants in _PERMISSION_LEVELS:  # descending thresholds
        arr = F.array(*[F.lit(g) for g in grants])
        expr = F.when(c >= threshold, arr) if expr is None else expr.when(c >= threshold, arr)
    return expr.otherwise(F.array().cast("array<string>"))


def badge_status_decode(col: Column | str) -> Column:
    """Decode a badge-status display string into (status, level, date).

    Mirrors lib/osm/badge.rb:206-231: the API renders progress as one of
    'Started' | 'Due' | 'Due Lvl N' | 'Awarded' | 'Awarded Lvl N' |
    '<date>' | '<date> (Lvl N)'. Returns struct<status:string, level:int,
    date:date>; a bare/parenthesized date means awarded on that date.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(c)
    level = F.regexp_extract(s, r"Lvl (\d+)", 1).try_cast("int")
    date_str = F.regexp_extract(s, r"^(\d{2}/\d{2}/\d{4})", 1)
    date = F.try_to_timestamp(F.nullif(date_str, F.lit("")), F.lit("dd/MM/yyyy")).cast("date")
    status = (
        F.when(s.startswith("Started"), F.lit("started"))
        .when(s.startswith("Due"), F.lit("due"))
        .when(s.startswith("Awarded") | date.isNotNull(), F.lit("awarded"))
        .otherwise(F.lit(None).cast("string"))
    )
    return F.struct(status.alias("status"), level.alias("level"), date.alias("date"))


def name_number_split(col: Column | str) -> Column:
    """Split 'Name  1234567890' into struct<name,number> (sms.rb:154,164-167).

    Number keeps a leading '+' prefix convention: reference prepends '+' to
    the extracted digits.
    """
    c = F.col(col) if isinstance(col, str) else col
    name = F.regexp_extract(c, r"^(.*\w)\W+(\d*)$", 1)
    number = F.regexp_extract(c, r"^(.*\w)\W+(\d*)$", 2)
    return F.struct(
        F.nullif(name, F.lit("")).alias("name"),
        F.when(number != "", F.concat(F.lit("+"), number)).otherwise(F.lit(None)).alias("number"),
    )


def sent_at_subject_split(col: Column | str) -> Column:
    """Split '28/02/2016 13:45 - Subject' (email.rb:127-130).

    Returns struct<sent_at:timestamp, subject:string>; split limit 2 so the
    subject may itself contain ' - '.
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, " - ", 2)
    return F.struct(
        F.try_to_timestamp(parts.getItem(0), F.lit("dd/MM/yyyy HH:mm")).alias("sent_at"),
        parts.getItem(1).alias("subject"),
    )


def strip_html(col: Column | str) -> Column:
    """Remove markup tags, the reference's text extraction (email.rb:356).

    This is the canonical deterministic text extractor: ``gsub(/<\\/?[^>]*>/,
    '')`` — nothing else is normalized, preserving the byte-identical
    ``text``-per-url invariant (BASELINE.json:15).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"</?[^>]*>", "")


# F13 audit-trail attendance display → canonical value (event.rb:869-875).
_ATTENDING_VALUES: list[tuple[str, str]] = [
    ("Yes", "yes"),
    ("No", "no"),
    ("Invited", "invited"),
    ("Show in My.SCOUT", "shown"),
    ("Reserved", "reserved"),
]


def audit_trail_parse(type_col: Column | str, desc: Column | str) -> Column:
    """F13 audit-trail description parse (lib/osm/event.rb:889-897).

    ``detail`` rows match ``Set '<label>' to '<value>'`` (greedy named
    groups, so quotes inside label/value survive); ``attendance`` rows
    match ``Attendance: <value>`` with the display string mapped to its
    canonical symbol (event.rb:869-875). Returns
    struct<label:string, value:string, attendance:string>, fields NULL
    when the row type or shape doesn't apply.
    """
    t = F.col(type_col) if isinstance(type_col, str) else type_col
    d = F.col(desc) if isinstance(desc, str) else desc
    is_detail = t == "detail"
    label = F.when(is_detail, F.nullif(F.regexp_extract(d, r"^Set '(.+)' to '(.+)'$", 1), F.lit("")))
    value = F.when(is_detail, F.nullif(F.regexp_extract(d, r"^Set '(.+)' to '(.+)'$", 2), F.lit("")))
    raw_att = F.nullif(F.regexp_extract(d, r"^Attendance: (.+)$", 1), F.lit(""))
    att_map = None
    for display, sym in _ATTENDING_VALUES:
        att_map = (
            F.when(raw_att == display, sym)
            if att_map is None
            else att_map.when(raw_att == display, sym)
        )
    attendance = F.when(t == "attendance", att_map.otherwise(F.lit(None)))
    return F.struct(
        label.alias("label"), value.alias("value"), attendance.alias("attendance")
    )


def template_tag_present(content: Column | str, tag: Column | str) -> Column:
    """F22 required-template-tag containment (lib/osm/myscout.rb:275-282):
    the rendered tag is the literal ``[<tag-id>]`` inside the content."""
    c = F.col(content) if isinstance(content, str) else content
    t = F.col(tag) if isinstance(tag, str) else tag
    return c.contains(F.concat(F.lit("["), t, F.lit("]")))


def credits_remaining(col: Column | str) -> Column:
    """A13 SMS credits parse (lib/osm/sms.rb:30): the API answers with a
    human string; the reference extracts the single digit run via
    ``\\A[^\\d]*(\\d+)[^\\d]*\\Z``. NULL when the shape doesn't match."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(
        F.regexp_extract(c, r"^[^\d]*(\d+)[^\d]*$", 1), F.lit("")
    ).try_cast("int")


def identifier(id_col: Column | str, suffix: Column | str) -> Column:
    """Composite identifier ``id + '_' + suffix`` (badges.rb:82, badge.rb:301)."""
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    s = F.col(suffix) if isinstance(suffix, str) else suffix
    return F.concat_ws("_", i.cast("string"), s.cast("string"))
