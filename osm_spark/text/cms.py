"""Count-min sketch over the token stream.

The classic Cormode–Muthukrishnan sketch (ICALP 2003 — public
algorithm, independently implemented): ``depth`` hash rows × ``width``
buckets; every token occurrence increments one cell per row; a token's
frequency estimate is the MIN of its ``depth`` cells — never an
underestimate, over by at most the collision mass in its lightest cell.

Scale shape: the build is ONE combiner-reduced shuffle whose key space
is at most ``depth × width`` cells no matter how many tokens flow in —
the sketch table is constant-size, so a 100 TB corpus reduces to a few
thousand rows that then broadcast to whoever needs estimates.  The
per-occurrence fan-out is ``depth`` rows (a small constant) and is
map-side combined before the exchange.

Hashes are the engine's portable salted-md5 (same byte-for-byte in
Spark and DuckDB — the sampling/sharding idiom), which is what makes
the WHOLE sketch, cell values and all, exactly SQL-replayable: the
driver gate checks the estimate table bit-for-bit, not "approximately".

Reference parity: robertgauld/osm has no sketches (it counts via the
remote API); CMS is the bounded-memory frequency layer a web-scale
corpus profile needs next to the exact two-pass heavy hitters
(text/hitters.py), which it complements: hitters is exact with a
certificate, CMS is one-pass with a proven overestimate bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["cms_build", "cms_estimate"]


def _bucket(tok, j: int, width: int):
    digest = F.md5(F.concat(F.lit(f"cms{j}:"), tok))
    return (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % width
    ).cast("int")


def cms_build(
    df: DataFrame,
    *,
    text_col: str = "text",
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Sketch table ``(j, bucket, cnt)`` — one row per non-empty cell.
    Tokenization is the engine-wide single-space split with the
    ``word_frequencies`` empty-token policy (zero-length tokens from
    doubled spaces are dropped — ADVICE r4 tokenizer alignment); null
    texts contribute nothing."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    tok = F.explode(F.split(F.lower(text_col), " ")).alias("tok")
    toks = (
        df.where(F.col(text_col).isNotNull())
        .select(tok)
        .where(F.length("tok") > 0)
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                _bucket(F.col("tok"), j, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        toks.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    queries: DataFrame,
    *,
    token_col: str = "tok",
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Frequency estimates ``(tok, est)`` for each query token: min over
    the token's ``depth`` cells (0 when a cell is absent — the token
    never hashed there, so its true count is 0).  ``depth``/``width``
    must match the build.  The sketch side is at most depth×width rows,
    so Spark broadcasts it and the probe is shuffle-free on the query
    side.  Zero-length query tokens are dropped, mirroring the build's
    ``word_frequencies`` policy — '' never acquires sketch mass, so an
    estimate for it would be pure collision noise."""
    queries = queries.where(F.length(token_col) > 0)
    probes = queries.select(
        F.col(token_col).alias("tok"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col(token_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    ).select("tok", "c.j", "c.bucket")
    joined = probes.join(F.broadcast(cms), on=["j", "bucket"], how="left")
    return (
        joined.groupBy("tok")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("est")
        )
    )
