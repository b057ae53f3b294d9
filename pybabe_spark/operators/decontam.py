"""Benchmark decontamination and duplicated-n-gram coverage.

Training-data hygiene ops every large-scale pipeline runs before
pretraining (beyond-reference; the reference's closest primitive is
whole-row dedup, pybabe/dedup.py:5-35):

- :func:`decontaminate` — drop (or flag) training documents that share
  any word n-gram with a benchmark/eval corpus, the standard guard
  against test-set leakage. Real pipelines use n≈13; the parameter is
  free.
- :func:`duplicated_ngram_coverage` / :func:`coverage_dedup` — per-doc
  fraction of its distinct n-grams that also occur in other documents
  (the RefinedWeb/Gopher "dup n-gram" family), and the filter that
  drops docs above a coverage threshold.

Scale shapes: benchmark n-grams are distinct-then-broadcast (eval sets
are KB-to-MB next to a 100 TB corpus), so contamination is one exploded
broadcast semi-join + a distinct on doc ids — no corpus self-join.
Coverage is two hash-aggregate shuffles (by shingle, then by doc), both
map-side combinable and linear in corpus size. All expressions are JVM
codegen; no Python in either path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pybabe_spark.functions.text import shingles
from pybabe_spark.operators.dedup_scale import _shingle_rows


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Ids of documents sharing ≥1 word n-gram with the benchmark."""
    bench_sh = (
        benchmark.select(
            F.explode(shingles(bench_text_col or text_col, n)).alias("__shingle")
        )
        .distinct()
    )
    doc_sh = _shingle_rows(docs, id_col, text_col, n)
    return (
        doc_sh.join(F.broadcast(bench_sh), "__shingle", "semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    mode: str = "drop",
) -> DataFrame:
    """Remove (``mode='drop'``) or mark (``mode='flag'``, boolean
    ``contaminated`` column) training docs that leak benchmark n-grams."""
    bad = contaminated_ids(docs, benchmark, n, id_col, text_col, bench_text_col)
    if mode == "drop":
        return docs.join(bad, id_col, "left_anti")
    if mode == "flag":
        flagged = bad.withColumn("contaminated", F.lit(True))
        return docs.join(flagged, id_col, "left").withColumn(
            "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
        )
    raise ValueError(f"decontaminate: unknown mode {mode!r}")


def duplicated_ngram_coverage(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_shingles, dup_coverage): fraction of the doc's DISTINCT
    word n-grams that occur in at least one other document.

    dup_coverage is DECIMAL(18,6)-rounded double so any SQL engine
    reproduces it bit-for-bit (small-integer ratio).

    Plan: per-shingle occurrence counts via a count window partitioned
    by shingle (one shuffle) feeding the per-doc aggregation (second
    shuffle) — two shuffles total, versus three for the equivalent
    groupBy-then-self-join formulation.
    """
    from pyspark.sql import Window

    sh = _shingle_rows(docs, id_col, text_col, n)
    counted = sh.withColumn(
        "__docs_with", F.count(F.lit(1)).over(Window.partitionBy("__shingle"))
    )
    return (
        counted
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            (
                F.sum((F.col("__docs_with") > 1).cast("int"))
                / F.count(F.lit(1))
            )
            .cast("decimal(18,6)")
            .cast("double")
            .alias("dup_coverage"),
        )
    )


def coverage_dedup(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop documents whose duplicated-n-gram coverage is ≥ threshold
    (mostly-boilerplate / heavily-duplicated content)."""
    cov = duplicated_ngram_coverage(docs, n, id_col, text_col)
    keep = cov.filter(F.col("dup_coverage") < F.lit(threshold)).select(id_col)
    return docs.join(keep, id_col, "semi")
