"""Scalar column-expression library (SURVEY.md §2.7 F1–F22).

Everything here returns a pyspark ``Column`` built from JVM-side built-ins —
no Python UDFs — so the expressions inline into whole-stage codegen and
survive predicate pushdown.
"""

from osm_spark.functions.parsing import (  # noqa: F401
    age_months,
    age_years,
    audit_trail_parse,
    badge_status_decode,
    cost_tbc,
    credits_remaining,
    email_with_name,
    epoch_date,
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
    template_tag_present,
    to_i_or_nil,
)
from osm_spark.functions.tags import (  # noqa: F401
    core_custom_split,
    date_keyed_map,
    key_pattern_filter,
    requirement_met,
    transform_int_keys,
)
