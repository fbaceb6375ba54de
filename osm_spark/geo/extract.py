"""Deterministic coordinate extraction from page text (Arrow UDF).

The grammar is pinned (SURVEY.md §2.10): a page's coordinate is the FIRST
occurrence of ``geo:<lat>,<lon>`` with plain decimal degrees. Extraction is
regex-only, no normalization — paired with the byte-identical ``text``
invariant (BASELINE.json:15) this makes (url → lat, lon) reproducible
bit-exactly across runs and engines.

Vectorized via pandas ``str.extract`` (C regex engine over the whole batch,
zero per-row Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

COORD_REGEX = r"geo:(-?\d{1,2}\.\d{1,6}),(-?\d{1,3}\.\d{1,6})"

_SCHEMA = StructType(
    [StructField("lat", DoubleType()), StructField("lon", DoubleType())]
)


@F.pandas_udf(_SCHEMA)
def extract_coords_udf(text: pd.Series) -> pd.DataFrame:
    ext = text.str.extract(COORD_REGEX, expand=True)
    lat = pd.to_numeric(ext[0], errors="coerce")
    lon = pd.to_numeric(ext[1], errors="coerce")
    # Reject out-of-domain coordinates rather than wrap them.
    bad = (lat.abs() > 90) | (lon.abs() > 180)
    lat[bad] = None
    lon[bad] = None
    return pd.DataFrame({"lat": lat, "lon": lon})


def extract_coords(text: Column | str) -> Column:
    """struct<lat:double, lon:double> from a text column (NULLs if absent)."""
    c = F.col(text) if isinstance(text, str) else text
    return extract_coords_udf(c)


def extract_coords_py(text: str) -> tuple[float | None, float | None]:
    """Pure-Python oracle for the extraction grammar (golden tests)."""
    import re

    m = re.search(COORD_REGEX, text or "")
    if not m:
        return None, None
    lat, lon = float(m.group(1)), float(m.group(2))
    if abs(lat) > 90 or abs(lon) > 180:
        return None, None
    return lat, lon
