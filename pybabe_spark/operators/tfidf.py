"""TF-IDF keyword extraction over a document corpus.

Beyond-reference text analysis (SURVEY §2's text family): the standard
corpus-statistics weighting — term frequency × smoothed inverse document
frequency — surfacing each document's most characteristic terms. A
training-data pipeline uses this for topic tagging, near-dup triage, and
quality review samples.

Scale shape: one (doc, term) hash aggregation for tf, one term-level
aggregation for document frequency (both map-side combinable), a
broadcast-friendly join of the (small) term-idf table back onto the
(doc, term) rows, then a per-doc top-k window. Everything is JVM
expressions; shuffles are linear in corpus token count.

Cross-engine determinism: idf = ln((N+1)/(df+1)) + 1 over IEEE doubles
(identical inputs both engines), scores ranked on their DECIMAL(18,6)
rounding with a term-name tiebreak so a sub-ulp libm difference cannot
reorder the top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, term, tf, score) — each document's top-``k`` TF-IDF terms.

    score = tf × (ln((N+1)/(df+1)) + 1), DECIMAL(18,6)-rounded; ties
    break on term name ascending.
    """
    n_docs = docs.count()
    terms = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ", -1)).alias("term"),
    )
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df_counts.select(
        "term",
        (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("idf"),
    )
    scored = tf.join(idf, "term").select(
        "id",
        "term",
        "tf",
        (F.col("tf") * F.col("idf")).cast("decimal(18,6)").cast("double")
        .alias("score"),
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def tfidf_sql(k: int = 3) -> str:
    """The DuckDB oracle form of :func:`tfidf_top_terms` over the
    ``documents`` table (same smoothing, same rounding, same tiebreak)."""
    return f"""
    WITH terms AS (
      SELECT doc_id AS id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (SELECT id, term, COUNT(*) AS tf FROM terms GROUP BY id, term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    idf AS (
      SELECT term, ln((n.n_docs + 1.0) / (COUNT(*) + 1.0)) + 1.0 AS idf
      FROM tf, n GROUP BY term, n.n_docs
    ),
    scored AS (
      SELECT tf.id, tf.term, tf.tf,
             CAST(CAST(tf.tf * idf.idf AS DECIMAL(18,6)) AS DOUBLE) AS score
      FROM tf JOIN idf USING (term)
    )
    SELECT id, term, tf, score FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                                   ORDER BY score DESC, term ASC) AS rk
      FROM scored
    ) WHERE rk <= {k}
    """
