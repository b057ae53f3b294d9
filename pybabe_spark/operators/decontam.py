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


def positional_shingle_rows(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, pos, shingle) — one row per word n-gram START (0-based),
    NON-distinct: position-aware sibling of ``_shingle_rows`` for span
    surgery. Docs shorter than n contribute no rows."""
    ws = df.select(
        F.col(id_col),
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ", -1).alias("__w"),
    )
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(F.col("__w"), i + k + 1) for k in range(n)]
    )
    grams = F.when(
        F.size("__w") >= n,
        F.transform(F.sequence(F.lit(0), F.size("__w") - n), gram),
    ).otherwise(F.array().cast("array<string>"))
    return ws.select(
        F.col(id_col), F.posexplode(grams).alias("__pos", "__shingle")
    )


def strip_duplicated_spans(
    docs: DataFrame,
    n: int = 15,
    min_dup: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicated-substring REMOVAL (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"; the
    RefinedWeb exact-substring pass): delete every word covered by some
    word n-gram that occurs ≥ ``min_dup`` times corpus-wide, keep the
    rest of the document in order. The classic suffix-array formulation
    is a single-machine algorithm; this is the equivalent at n-gram
    resolution (any duplicated substring of length ≥ n is a run of
    duplicated n-grams, so the covered-word sets coincide).

    Returns (id, text, n_words, n_removed); fully-duplicated documents
    come back with empty text, the row is kept.

    100 TB shape: positional n-gram explode (linear) → one
    map-side-combinable count groupBy on the gram string → one semi
    join marking duplicated STARTS → per-doc coverage via ONE running-
    max window PARTITIONED BY doc (gaps-and-islands; never a global
    window) → one groupBy(id) reassembly. No self-join, no Python.
    """
    from pyspark.sql import Window

    grams = positional_shingle_rows(docs, id_col, text_col, n)
    dup = (
        grams.groupBy("__shingle")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_dup)
        .select("__shingle")
    )
    starts = grams.join(dup, "__shingle", "semi").select(
        F.col(id_col).alias("__sid"), F.col("__pos").alias("__start")
    )
    # NULL text behaves like '' (one empty word, no grams) — posexplode
    # of a NULL array would emit zero rows and silently DROP the doc,
    # breaking the every-row-kept contract
    words = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ", -1)
        ).alias("__wpos", "__word"),
    )
    marked = words.join(
        starts,
        (F.col(id_col) == F.col("__sid"))
        & (F.col("__wpos") == F.col("__start")),
        "left",
    ).select(id_col, "__wpos", "__word", "__start")
    w = (
        Window.partitionBy(id_col)
        .orderBy("__wpos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    covered = marked.withColumn(
        "__cover_end",
        F.max(
            F.when(F.col("__start").isNotNull(), F.col("__wpos") + n - 1).otherwise(
                F.lit(-1)
            )
        ).over(w),
    )
    # __cover_end >= wpos  <=>  some duplicated n-gram starting at or
    # before this word still covers it
    covered = covered.withColumn("__keep", F.col("__cover_end") < F.col("__wpos"))
    return covered.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("__keep"), F.struct("__wpos", "__word"))
                    )
                ),
                lambda s: s["__word"],
            ),
            " ",
        ).alias(text_col),
        F.count(F.lit(1)).alias("n_words"),
        F.sum((~F.col("__keep")).cast("bigint")).alias("n_removed"),
    )


def novelty_score(
    docs: DataFrame,
    reference: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_id_col: str | None = None,
    ref_text_col: str | None = None,
) -> DataFrame:
    """(id, n_shingles, novelty): per document, the fraction of its
    DISTINCT word ``n``-grams that do NOT occur anywhere in the
    ``reference`` corpus — the selection-side twin of
    :func:`contaminated_ids` (decontamination asks "does this doc leak
    the benchmark?"; novelty asks "does this doc add anything the
    training set doesn't already have?"). High-novelty docs are the
    ones worth keeping when growing a corpus; near-zero novelty is
    redundancy the dedup family may still miss (paraphrase-level
    n-gram reuse below the near-dup threshold).

    Plan: reference shingles collapse to a DISTINCT shingle set (hash
    agg with map-side combine — value-space-sized, reusable across
    probes), then one left-anti-style flag via a left join on shingle
    and a per-doc aggregation. Two shuffles on the shingle key + one on
    the doc id; never all-pairs, no window over the corpus.

    Determinism: novelty is a small-integer ratio, DECIMAL(18,6)-
    rounded like ``duplicated_ngram_coverage``. A doc with no shingles
    (empty text) is absent from the output.
    """
    rid = ref_id_col or id_col
    rtext = ref_text_col or text_col
    ref_sh = (
        _shingle_rows(reference, rid, rtext, n)
        .select(F.col("__shingle").alias("__ref_s"))
        .distinct()
    )
    sh = _shingle_rows(docs, id_col, text_col, n)
    flagged = sh.join(
        ref_sh, sh["__shingle"] == ref_sh["__ref_s"], "left"
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        (
            F.sum(F.col("__ref_s").isNull().cast("int"))
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .cast("double")
        .alias("novelty"),
    )


def strip_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 2,
    line_sep: str = "\n",
    min_line_chars: int = 1,
) -> DataFrame:
    """C4/RefinedWeb line-level boilerplate removal: any LINE whose
    verbatim text occurs in at least ``min_df`` DISTINCT documents is
    deleted from every document (nav bars, cookie banners, footers —
    the dominant residual duplication after doc-level dedup). Returns
    ``(id, text)`` with each document's surviving lines rejoined in
    their original order; a fully-boilerplate document survives as an
    empty string. Lines whose trimmed length is under
    ``min_line_chars`` are always KEPT and never counted (blank lines
    are structure, not boilerplate). NULL texts are dropped (the house
    text-op contract); line matching is verbatim — normalize upstream
    (``functions.text.normalize_text``) for fuzzier matching.

    Scale shape: one narrow posexplode, a (line-hash → distinct-doc
    count) hash agg with map-side combine, one line-hash equi-join of
    the lines against the boilerplate table (left-anti — shuffle keyed
    by a 128-bit md5 of the line, so wide lines never ride the
    shuffle twice), and one per-doc reassembly agg whose ordering is
    an in-row ``array_sort`` over (pos, line) structs — no window, no
    driver state, three shuffles total. The boilerplate table scales
    with the number of REPEATED distinct lines, not the corpus.
    """
    if min_df < 2:
        raise ValueError(
            f"strip_boilerplate_lines: min_df {min_df} must be >= 2 "
            "(1 would delete every eligible line)"
        )
    # line_sep is a LITERAL separator (the rejoin below uses it
    # verbatim in array_join), but F.split takes a Java regex — quote
    # it Pattern.quote-style so '.', '|' etc. split literally. The
    # DuckDB oracle (strip_boilerplate_lines_sql) supports only the
    # default newline separator.
    sep_pattern = "\\Q" + line_sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    lines = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.posexplode(
                F.split(F.col(text_col), sep_pattern, -1)
            ).alias("__pos", "__line"),
        )
        .withColumn("__h", F.md5(F.col("__line")))
        .withColumn(
            "__elig",
            F.length(F.trim(F.col("__line"))) >= min_line_chars,
        )
    )
    boiler = (
        lines.filter(F.col("__elig"))
        .select(F.col(id_col), F.col("__h"))
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= min_df)
        .select("__h")
    )
    kept = lines.join(
        boiler,
        (lines["__h"] == boiler["__h"]) & lines["__elig"],
        "left_anti",
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__line"))
                ),
                lambda x: x["__line"],
            ),
            line_sep,
        ).alias(text_col)
    )
    ids = df.filter(F.col(text_col).isNotNull()).select(id_col)
    return ids.join(rebuilt, id_col, "left").select(
        id_col, F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )


def strip_boilerplate_lines_sql(
    select: str,
    id_col: str,
    text_col: str,
    min_df: int = 2,
    min_line_chars: int = 1,
) -> str:
    """DuckDB oracle of :func:`strip_boilerplate_lines` — identical
    verbatim-line df counting and ordered reassembly (string_agg with
    ORDER BY replays the array_sort-by-position rebuild)."""
    return f"""
    WITH src AS ({select}),
    ls AS (
        SELECT {id_col}, string_split({text_col}, chr(10)) AS __ls
        FROM src WHERE {text_col} IS NOT NULL
    ),
    lines AS (
        SELECT {id_col}, r.i AS __pos, __ls[r.i] AS __line,
               length(trim(__ls[r.i])) >= {min_line_chars} AS __elig
        FROM ls, LATERAL unnest(range(1, len(__ls) + 1)) AS r(i)
    ),
    boiler AS (
        SELECT md5(__line) AS __h
        FROM (SELECT DISTINCT {id_col}, __line FROM lines WHERE __elig)
        GROUP BY md5(__line) HAVING COUNT(*) >= {min_df}
    ),
    kept AS (
        SELECT * FROM lines l
        WHERE NOT (l.__elig AND md5(l.__line) IN (SELECT __h FROM boiler))
    )
    SELECT s.{id_col},
           COALESCE(k.{text_col}, '') AS {text_col}
    FROM (SELECT {id_col} FROM src WHERE {text_col} IS NOT NULL) s
    LEFT JOIN (
        SELECT {id_col},
               string_agg(__line, chr(10) ORDER BY __pos) AS {text_col}
        FROM kept GROUP BY {id_col}
    ) k USING ({id_col})
    """
