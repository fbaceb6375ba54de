"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003 — the
MOSS algorithm): position-aware local fingerprints that detect PARTIAL
overlap (quoted paragraphs, syndicated passages, licence boilerplate)
which whole-document MinHash/SimHash cannot see.

Guarantee: any shared token run of length ≥ k + w − 1 between two
documents yields at least one shared fingerprint; expected density is
2/(w+1) fingerprints per k-gram.

Determinism: the k-gram hash is the first 8 hex chars of md5 (engine-
neutral, like the sampling/sharding operators); window ties select the
RIGHTMOST minimal hash via an integer argmax formulation
(max(i · [h_i = min])) that both engines evaluate identically — no
reliance on reverse()/position() builtins whose tie semantics differ.

Scale design (10^12 docs): fully row-local — zero shuffle, zero UDF,
pure Column higher-order functions; output explodes to (doc, pos, fp)
rows ready for a fingerprint-keyed equi self-join (the same bucket-join
shape as LSH candidates; candidate volume is O(shared-fingerprint
pairs), never O(n²)). The hash array is materialized behind ONE
``explode(array(...))`` Generate barrier before the window sweep:
CollapseProject would otherwise clone the full md5-array expression into
every one of the O(n·w) window references (BENCH.md finding #2 — the
same counter-move as the JVM extraction engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, fp) — distinct selected fingerprints per document.

    ``pos`` is the 1-based index of the selected k-gram; documents with
    fewer than ``k`` tokens yield no rows; documents with fewer than
    ``w`` k-grams use one window over all of them (min of the whole
    hash sequence).
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k}, w={w}")
    from osm_spark.text.ngrams import _gram_arrays

    # same tokenizer + k-gram windows (and the sequence(1,0)-descends
    # guard) as the n-gram/decontamination keys — one definition to drift
    grams, _ = _gram_arrays(F.col(text_col), k)
    hashes = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
    )
    # Generate barrier 1: materialize the hash array once (module doc)
    staged = docs.select(
        F.col(id_col), F.explode(F.array(hashes)).alias("h")
    )

    h = F.col("h")
    m = F.size(h)
    weff = F.least(F.lit(w), m)
    mins_expr = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m - weff + 1),
            lambda j: F.array_min(F.slice(h, j, weff)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    # Generate barrier 2: materialize per-window minima — referencing the
    # min expression inside sel_pos would re-evaluate the O(w) slice scan
    # for every one of the w compared elements (O(w²) per window)
    staged2 = staged.select(
        F.col(id_col), h, F.explode(F.array(mins_expr)).alias("mins")
    )

    mv = lambda j: F.element_at(F.col("mins"), j.cast("int"))  # noqa: E731
    weff2 = F.least(F.lit(w), F.size(h))
    # rightmost index of the window minimum: max over i of i·[h_i = min]
    sel_pos = lambda j: F.array_max(  # noqa: E731
        F.transform(
            F.sequence(j, j + weff2 - 1),
            lambda i: F.when(
                F.element_at(h, i.cast("int")) == mv(j), i
            ).otherwise(F.lit(0).cast("long")),
        )
    )
    # guard: an empty mins array (doc shorter than k tokens) would make
    # sequence(1, 0) DESCEND to [1, 0] and element_at error out
    fps = F.when(
        F.size(F.col("mins")) >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(F.col("mins"))),
                lambda j: F.struct(
                    sel_pos(j).alias("pos"), mv(j).alias("fp")
                ),
            )
        ),
    ).otherwise(F.array().cast("array<struct<pos:long,fp:long>>"))

    return (
        staged2.select(F.col(id_col), F.explode(fps).alias("s"))
        .select(
            id_col,
            F.col("s.pos").cast("int").alias("pos"),
            F.col("s.fp").alias("fp"),
        )
    )


def winnow_sql(docs_table: str, k: int = 3, w: int = 4) -> str:
    """DuckDB replay: identical tokenization, hash, window and tie rule."""
    gram = " || ' ' || ".join(f"toks[i + {j}]" for j in range(k))
    return f"""
        WITH toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS toks
            FROM {docs_table}
        ),
        hashed AS (
            SELECT doc_id,
                   list_transform(
                       list_transform(
                           generate_series(1, greatest(len(toks) - {k - 1}, 0)),
                           i -> {gram}),
                       g -> CAST('0x' || substr(md5(g), 1, 8) AS BIGINT)) AS h
            FROM toks
        ),
        windows AS (
            SELECT doc_id, h,
                   least({w}, len(h)) AS weff,
                   unnest(generate_series(1, len(h) - least({w}, len(h)) + 1)) AS j
            FROM hashed
            WHERE len(h) >= 1
        ),
        selected AS (
            SELECT doc_id, j,
                   list_min(list_slice(h, j, j + weff - 1)) AS mv,
                   list_max(list_transform(
                       generate_series(j, j + weff - 1),
                       i -> CASE WHEN h[i] = list_min(list_slice(h, j, j + weff - 1))
                                 THEN i ELSE 0 END)) AS pos
            FROM windows
        )
        SELECT DISTINCT doc_id, CAST(pos AS INT) AS pos, mv AS fp
        FROM selected
    """
