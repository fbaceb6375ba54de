"""BM25 full-text relevance scoring over the corpus.

The retrieval primitive behind contamination screens, dedup-candidate
ranking and data-curation search ("find every page about X and inspect
the cluster"). Standard Okapi BM25 with the Lucene idf form:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d)    = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Hash-gate design: floating sums over a groupBy are order-dependent, so —
exactly like ``lm_score`` — each per-term score is quantized to
micro-units (round(x·1e6) as LONG) before the per-doc sum; integer sums
are associative, so the result is independent of partial-aggregation
order and replayable in SQL verbatim.

Scale design (10^12 docs): the query-term IN-list filter runs during the
token explode, so only matching (doc, term) occurrences survive — the
aggregate input is |hits|, not |tokens|. Corpus stats (N, avgdl) ride a
1-row cross join; the per-term df table is |query terms| rows and
broadcasts. One doc-keyed exchange for tf, one for the final per-doc
sum; no window, no driver loop, no O(|tokens|) shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hit_terms, score_micro, score) for every document
    matching ≥1 query term. ``score_micro`` (the exact long) is the
    value-hash column; ``score`` is its double rendering rounded to 6.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})

    from osm_spark.text.analysis import _words

    # one tokenization projection feeds hits, dl and the stats aggregate
    # — the corpus is lowercased/split once, not three times
    tokd = docs.select(F.col(id_col), _words(F.col(text_col)).alias("toks"))
    dl = tokd.select(F.col(id_col), F.size("toks").alias("dl"))
    stats = dl.select(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    hits = tokd.select(
        F.col(id_col), F.explode("toks").alias("term")
    ).filter(F.col("term").isin(terms))
    tf = hits.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_t = hits.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_part = (
        F.col("tf") * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    term_score_micro = F.round(idf * tf_part * F.lit(1000000.0)).cast("long")

    return (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), term_score_micro.alias("ts"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_hit_terms"),
            F.sum("ts").alias("score_micro"),
        )
        .select(
            id_col,
            "n_hit_terms",
            "score_micro",
            F.round(F.col("score_micro") / F.lit(1e6), 6).alias("score"),
        )
    )


def bm25_scores_sql(
    docs_table: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB replay: identical tokenization, formula, quantization.

    Every fractional literal is CAST AS DOUBLE: DuckDB parses ``2.2`` as
    DECIMAL, and decimal-exact ``tf*2.2`` rounds differently from the
    engine's ``double(tf) * double(2.2)`` (one rounding vs two) — a
    one-ulp divergence the micro-quantization cannot always absorb.
    """
    terms = sorted({t.lower() for t in query_terms})
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    d = lambda v: f"CAST({v!r} AS DOUBLE)"  # noqa: E731
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM {docs_table}
        ),
        dl AS (
            SELECT doc_id, len(string_split(lower(text), ' ')) AS dl
            FROM {docs_table}
        ),
        stats AS (
            SELECT count(*) AS n_docs,
                   avg(len(string_split(lower(text), ' '))) AS avgdl
            FROM {docs_table}
        ),
        hits AS (
            SELECT doc_id, term FROM toks WHERE term IN ({in_list})
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM hits GROUP BY doc_id, term
        ),
        df_t AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY term
        ),
        scored AS (
            SELECT tf.doc_id,
                   CAST(round(
                       ln({d(1.0)} + (stats.n_docs - df_t.df + {d(0.5)})
                                     / (df_t.df + {d(0.5)}))
                       * (tf.tf * {d(k1 + 1.0)}
                          / (tf.tf + {d(k1)}
                             * ({d(1.0 - b)} + {d(b)} * dl.dl / stats.avgdl)))
                       * {d(1000000.0)}) AS BIGINT) AS ts
            FROM tf
            JOIN df_t USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN stats
        )
        SELECT doc_id,
               count(*) AS n_hit_terms,
               CAST(sum(ts) AS BIGINT) AS score_micro,
               round(CAST(sum(ts) AS DOUBLE) / 1000000.0, 6) AS score
        FROM scored
        GROUP BY doc_id
    """
