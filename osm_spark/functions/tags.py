"""Dynamic tag-map (``map<string,string>``) query semantics.

The reference's signature data-model move is a typed entity carrying an
open-schema key→value map (member ``additional_information``
lib/osm/member.rb:91-92; flexi ``fields`` lib/osm/flexi_record.rb:255;
badge ``requirements`` lib/osm/badge.rb:541). These helpers replicate its
map-query semantics as JVM-side higher-order functions — the same shapes an
OpenStreetMap ``tags`` column needs at 10^12-row scale, where ``map_filter``
/ ``transform_keys`` run inside codegen and never deserialize to Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def requirement_met(value: Column | str) -> Column:
    """The canonical tag-value truth test (lib/osm/badge.rb:855-859).

    A requirement value counts as met unless it is NULL, blank, the string
    '0', or starts with 'x'/'X' (truth table: spec/osm/badge_spec.rb:217-227).
    """
    v = F.col(value) if isinstance(value, str) else value
    return ~(
        v.isNull()
        | (F.trim(v) == "")
        | (v == "0")
        | (F.lower(F.substring(v, 1, 1)) == "x")
    )


def key_pattern_filter(m: Column | str, pattern: str, keep: bool = True) -> Column:
    """Keep (or drop) map entries whose key matches a regex.

    Mirrors the flexi/event key-regex splits (flexi_record.rb:98-100,
    event.rb:420-423): ``f_\\d+`` → fields map, ``p\\d+`` → payments map.
    """
    c = F.col(m) if isinstance(m, str) else m
    if keep:
        return F.map_filter(c, lambda k, v: k.rlike(pattern))
    return F.map_filter(c, lambda k, v: ~k.rlike(pattern))


def core_custom_split(
    m: Column | str, core_keys: list[str]
) -> tuple[Column, Column]:
    """Partition a map into (core, custom) by key whitelist.

    Mirrors CORE_FIELD_IDS membership (lib/osm/member.rb:31,169-182): core
    ids become typed struct fields, the rest stay in the tag map.
    """
    c = F.col(m) if isinstance(m, str) else m
    keys = F.array(*[F.lit(k) for k in core_keys])
    core = F.map_filter(c, lambda k, v: F.array_contains(keys, k))
    custom = F.map_filter(c, lambda k, v: ~F.array_contains(keys, k))
    return core, custom


def transform_int_keys(m: Column | str) -> Column:
    """Integer-cast map keys (member.rb:170: ``custom_data.map{ k.to_i }``).

    Keys that do not parse as integers are dropped first (a map key may not
    be NULL).
    """
    c = F.col(m) if isinstance(m, str) else m
    parsable = F.map_filter(c, lambda k, v: k.try_cast("long").isNotNull())
    return F.transform_keys(parsable, lambda k, v: k.try_cast("long"))


def date_keyed_map(m: Column | str, date_regex: str = r"^\d{4}-\d{2}-\d{2}$") -> Column:
    """Fold date-string keys into a date-typed entries array.

    The register/giftaid tables store one column per date, folded client-side
    into a Date→value map (register.rb:69-74; giftaid.rb:63-68). Map keys of
    DateType are not universally supported, so we return
    ``array<struct<date:date, value:string>>`` — the exploded long-table form
    recommended in SURVEY.md §1.4.
    """
    c = F.col(m) if isinstance(m, str) else m
    dated = F.map_filter(c, lambda k, v: k.rlike(date_regex))
    entries = F.map_entries(dated)
    return F.transform(
        entries,
        lambda e: F.struct(
            F.try_to_timestamp(e.getField("key"), F.lit("yyyy-MM-dd")).cast("date").alias("date"),
            e.getField("value").alias("value"),
        ),
    )
