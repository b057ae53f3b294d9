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

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pybabe_spark.operators._util import attach_scalars


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, term, tf, score) — each document's top-``k`` TF-IDF terms.

    score = tf × (ln((N+1)/(df+1)) + 1), DECIMAL(18,6)-rounded; ties
    break on term name ascending. Fully lazy: the corpus size enters the
    plan as a 1-row broadcast aggregate (``attach_scalars``), not a
    construction-time ``count()``.
    """
    terms = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ", -1)).alias("term"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n_docs"))
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = attach_scalars(df_counts, n_docs).select(
        "term",
        (F.log((F.col("__n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("idf"),
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


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, score) — Okapi BM25 relevance of every document that contains
    at least one of ``query_terms`` (docs matching none are absent, as in
    any inverted-index engine).

    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) with
    the Robertson/Lucene non-negative idf(t) = ln(1 + (N − df + 0.5)/(df
    + 0.5)).

    Scale shape (100 TB): document lengths and corpus totals are one
    linear map-combinable aggregation; term frequencies are computed only
    for the query's terms (the explode is filtered before the shuffle, so
    the (id, term) aggregation is proportional to the query's posting
    lists, not the corpus vocabulary); the per-term idf table is at most
    ``len(query_terms)`` rows and broadcast. The only corpus-wide
    exchanges are the two linear aggregations — no corpus self-join.

    Cross-engine determinism: per-term scores are IEEE doubles built from
    identical inputs with identical operation order in the SQL mirror
    (:func:`bm25_sql`), DECIMAL(18,6)-rounded per term (ln makes every
    value irrational — half-point risk is measure-zero), then summed
    exactly in decimal so per-doc totals are independent of Spark's
    aggregation order.
    """
    terms = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ", -1)).alias("term"),
    )
    # dl and tf each feed two consumers, but their duplicated subtrees
    # contain IDENTICAL shuffle exchanges, which Spark's ReuseExchange
    # already computes once per query — an explicit persist() here was
    # measured SLOWER at sf0.1 (0.56 → 0.87 s: cache materialization
    # replaces exchange reuse and breaks stage pipelining), so the
    # dedup is left to the optimizer. (dl is also corpus-row-sized —
    # one row per doc — so caching it at 100 TB would pin a 2-column
    # corpus in memory for no new saving.)
    dl = terms.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    scalars = dl.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.sum("dl").alias("__total_len"),
    )
    tf = (
        terms.filter(F.col("term").isin(list(query_terms)))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = attach_scalars(dfreq, scalars).select(
        "term",
        F.log(
            1.0 + (F.col("__n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
        (F.col("__total_len").cast("double") / F.col("__n_docs")).alias("avgdl"),
    )
    scored = (
        tf.join(dl, "id")
        .join(F.broadcast(idf), "term")
        .select(
            "id",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * (F.col("dl") / F.col("avgdl")))
                )
            )
            .cast("decimal(18,6)")
            .alias("__s"),
        )
    )
    return scored.groupBy("id").agg(
        F.sum("__s").cast("double").alias("score")
    )


def bm25_search(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 score, id-ascending tiebreak.

    The ranking is ``orderBy(...).limit(k)`` — Spark plans TakeOrdered
    (per-partition top-k, then a k-row merge on the driver), NOT a
    global row_number window, so the cut scales to any corpus size.
    """
    scores = bm25_scores(docs, query_terms, k1=k1, b=b,
                         id_col=id_col, text_col=text_col)
    return scores.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)


def bm25_sql(
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB oracle of :func:`bm25_search` over ``documents`` — same
    idf, same operation order, same per-term DECIMAL(18,6) rounding and
    exact decimal sum, same (score DESC, id ASC) top-``k``."""
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return f"""
    WITH terms AS (
      SELECT doc_id AS id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    dl AS (SELECT id, COUNT(*) AS dl FROM terms GROUP BY id),
    sc AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len
           FROM dl),
    tf AS (
      SELECT id, term, COUNT(*) AS tf FROM terms
      WHERE term IN ({in_list}) GROUP BY id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    idf AS (
      SELECT term,
             ln(1.0 + (sc.n_docs - df + 0.5) / (df + 0.5)) AS idf,
             CAST(sc.total_len AS DOUBLE) / sc.n_docs AS avgdl
      FROM dfreq, sc
    ),
    scored AS (
      SELECT tf.id,
             CAST(idf.idf * (tf.tf * ({k1} + 1.0))
                  / (tf.tf + {k1} * (1.0 - {b} + {b} * (dl.dl / idf.avgdl)))
                  AS DECIMAL(18,6)) AS s
      FROM tf JOIN dl USING (id) JOIN idf USING (term)
    )
    SELECT id, CAST(SUM(s) AS DOUBLE) AS score
    FROM scored GROUP BY id
    ORDER BY SUM(s) DESC, id ASC LIMIT {k}
    """


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


def _bm25_postings(docs: DataFrame, id_col: str, text_col: str):
    """(postings, stats): batch-local posting rows (term, id, tf, dl,
    bucket) and the 1-row (n_docs, total_len) aggregate. Both are pure
    functions of the batch — everything appended to an index stays
    valid forever (see :func:`append_bm25_index`)."""
    terms = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ", -1)).alias("term"),
    )
    dl = terms.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    postings = tf.join(dl, "id").withColumn(
        "bucket", F.substring(F.md5(F.col("term")), 1, 2)
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        # coalesce: SUM over zero rows is NULL, and the JSON writer
        # drops null fields — an empty-corpus build would then break
        # the first append_bm25_index read of total_len
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("total_len"),
    )
    return postings, stats


def build_bm25_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """Persist an inverted index for :func:`bm25_search_stored`: one
    posting row (term, id, tf, dl) per distinct (doc, term),
    partitioned by the term's md5 bucket (256 partitions), plus a 1-row
    ``_stats`` sidecar (n_docs, total_len).

    Document length is DENORMALIZED onto every posting row; term
    document-frequency deliberately is NOT — a probe recomputes df from
    the posting lists it reads anyway (one tiny aggregation), which is
    what makes :func:`append_bm25_index` exact: every stored field is a
    pure function of its own batch, so appended postings never
    invalidate old ones. The build is two linear aggregations + one
    id-keyed join, each map-side combinable — no term-keyed corpus
    aggregation at all.
    """
    postings, stats = _bm25_postings(docs, id_col, text_col)
    postings.write.mode(mode).partitionBy("bucket").parquet(path)
    stats.write.mode("overwrite").json(path.rstrip("/") + "/_stats")


def append_bm25_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Append a crawl batch to an existing :func:`build_bm25_index`
    layout WITHOUT re-reading any indexed text — the incremental-crawl
    shape of the stored MinHash index (`dedup_scale`), for retrieval.

    Correctness: posting rows (tf, dl) are batch-local facts; df is
    probe-time-computed; the corpus totals are additive — so append =
    write the batch's postings into the same bucket partitions + fold
    the batch's (n_docs, total_len) into ``_stats``. A probe after any
    number of appends is bit-identical to a fresh rebuild over the
    union (asserted in tests). Single-writer: the stats read-add-write
    is not transactional against concurrent appends.
    """
    spark = docs.sparkSession
    stats_path = path.rstrip("/") + "/_stats"
    # read with an explicit schema: an index built from an empty corpus
    # (or by an older build) may lack total_len in the JSON — schema'd
    # read yields NULL there instead of a missing-field error
    old = (
        spark.read.schema("n_docs bigint, total_len bigint")
        .json(stats_path)
        .limit(1)
        .collect()[0]
    )
    postings, stats = _bm25_postings(docs, id_col, text_col)
    postings.write.mode("append").partitionBy("bucket").parquet(path)
    add = stats.collect()[0]
    merged = spark.createDataFrame(
        [
            (
                (old["n_docs"] or 0) + add["n_docs"],
                (old["total_len"] or 0) + (add["total_len"] or 0),
            )
        ],
        "n_docs bigint, total_len bigint",
    )
    merged.write.mode("overwrite").json(stats_path)


def bm25_search_stored(
    spark,
    path: str,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` BM25 against a :func:`build_bm25_index` layout —
    bit-identical scores to the in-memory :func:`bm25_search` on the
    same corpus (same formulas, same decimal rounding; asserted in
    tests).

    Probe buckets are md5 prefixes computed driver-side from the query
    terms, so the partition filter is a LITERAL ``isin`` — Catalyst
    prunes non-probed partitions at the file listing, and the query
    reads only its own posting lists. Per-query work is proportional to
    those lists, not the corpus: lengths and corpus totals were
    precomputed at build time, and df is one tiny aggregation over the
    pruned rows themselves (a ≤ |query-terms|-row broadcast join — the
    probe-time recompute that makes appends exact; the 1-row stats
    attach is maxRows-proven via ``.limit(1)``).
    """
    import hashlib

    from pybabe_spark.operators._util import attach_scalars

    buckets = sorted(
        {hashlib.md5(t.encode("utf-8")).hexdigest()[:2] for t in query_terms}
    )
    postings = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(list(query_terms)))
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    postings = postings.join(F.broadcast(dfreq), "term")
    stats = spark.read.json(path.rstrip("/") + "/_stats").limit(1)
    scored = attach_scalars(postings, stats).select(
        "id",
        (
            F.log(
                1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1
                * (
                    1.0
                    - b
                    + b
                    * (
                        F.col("dl")
                        / (F.col("total_len").cast("double") / F.col("n_docs"))
                    )
                )
            )
        )
        .cast("decimal(18,6)")
        .alias("__s"),
    )
    scores = scored.groupBy("id").agg(F.sum("__s").cast("double").alias("score"))
    return scores.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)


def zipf_fit(
    docs: DataFrame,
    top_n: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Zipf rank–frequency fit over the corpus vocabulary — the
    one-row corpus-health certificate (natural language tracks slope
    ≈ −1 on the log-log rank/frequency line; synthetic, boilerplate-
    heavy, or truncated corpora drift off it): OLS of ``ln(count)`` on
    ``ln(rank)`` over the ``top_n`` most frequent whitespace terms,
    returning ``(n_terms, total_tokens, slope, intercept, r2)``.

    Determinism discipline: the top-``top_n`` cut is an
    ``orderBy(count desc, term)`` + ``limit`` (TakeOrdered — total
    order, both engines cut identically); ranks come from a
    ``limit``-proved self-join over that ≤``top_n``-row table (the
    bucket-prefix idiom — no corpus-sized window); each point's
    ``ln(rank)`` / ``ln(count)`` is a double both engines round
    identically, their products round once per point to
    DECIMAL(38,12), and the five OLS moments are exact decimal sums —
    order-independent. One fixed-shape IEEE finish rounds slope /
    intercept / r² once. NULL texts contribute nothing; empty
    vocabulary yields NULL fits.

    Scale shape: one token hash agg (map-combinable) → TakeOrdered
    ``top_n`` → bounded self-join (≤ top_n² pairs of a CONSTANT-sized
    table) → one 1-row agg. Corpus cost is the single count pass.
    """
    if top_n < 2:
        raise ValueError("zipf_fit: top_n must be >= 2")
    terms = docs.select(
        F.explode(F.split(F.col(text_col), " ", -1)).alias("__t")
    ).filter(F.col("__t") != "")
    counts = terms.groupBy("__t").agg(F.count(F.lit(1)).alias("__c"))
    top = counts.orderBy(
        F.col("__c").desc(), F.col("__t").asc()
    ).limit(top_n)
    a, b = top.alias("a"), top.alias("b")
    ranked = (
        a.join(
            b,
            (F.col("b.__c") > F.col("a.__c"))
            | (
                (F.col("b.__c") == F.col("a.__c"))
                & (F.col("b.__t") < F.col("a.__t"))
            ),
            "left",
        )
        .groupBy(F.col("a.__t").alias("__t"), F.col("a.__c").alias("__c"))
        .agg((F.count(F.col("b.__t")) + 1).alias("__r"))
    )
    pt = ranked.select(
        F.col("__c"),
        F.expr("ln(CAST(__r AS DOUBLE))").alias("__x"),
        F.expr("ln(CAST(__c AS DOUBLE))").alias("__y"),
    )
    d12 = lambda e: F.expr(e).cast("decimal(38,12)")  # noqa: E731
    agg = pt.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d12("__x")).cast("decimal(38,12)").alias("sx"),
        F.sum(d12("__y")).cast("decimal(38,12)").alias("sy"),
        F.sum(d12("__x * __y")).cast("decimal(38,12)").alias("sxy"),
        F.sum(d12("__x * __x")).cast("decimal(38,12)").alias("sxx"),
        F.sum(d12("__y * __y")).cast("decimal(38,12)").alias("syy"),
        F.sum("__c").cast("bigint").alias("total_top"),
    )
    tot = terms.agg(F.count(F.lit(1)).cast("bigint").alias("total_tokens"))
    one = attach_scalars(agg, tot)
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    vx = nd * sxx - sx * sx
    vy = nd * syy - sy * sy
    cov = nd * sxy - sx * sy
    out = lambda e: e.cast("decimal(18,6)").cast("double")  # noqa: E731
    return one.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.col("total_tokens"),
        F.when((F.col("n") >= 2) & (vx > 0.0), out(cov / vx)).alias(
            "slope"
        ),
        F.when(
            (F.col("n") >= 2) & (vx > 0.0),
            out((sy - (cov / vx) * sx) / nd),
        ).alias("intercept"),
        F.when(
            (F.col("n") >= 2) & (vx > 0.0) & (vy > 0.0),
            out(cov * cov / (vx * vy)),
        ).alias("r2"),
    )


def zipf_fit_sql(
    select: str, top_n: int = 1000, text_col: str = "text"
) -> str:
    """DuckDB oracle of :func:`zipf_fit` — same TakeOrdered cut, rank
    via the window DEFINITION (the engine's bounded self-join must
    reproduce it), same per-point rounding and finish."""
    fin = lambda e: f"CAST(CAST({e} AS DECIMAL(18,6)) AS DOUBLE)"  # noqa: E731
    vx = ("(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
          " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))")
    vy = ("(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
          " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))")
    cov = ("(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))")
    return f"""
    WITH toks AS (
        SELECT t FROM (
            SELECT unnest(string_split({text_col}, ' ')) AS t
            FROM ({select})
        ) WHERE t <> ''
    ),
    counts AS (SELECT t, COUNT(*) AS c FROM toks GROUP BY t),
    top AS (SELECT t, c FROM counts ORDER BY c DESC, t LIMIT {int(top_n)}),
    ranked AS (
        SELECT t, c,
               ROW_NUMBER() OVER (ORDER BY c DESC, t) AS r
        FROM top
    ),
    pt AS (
        SELECT c, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
        FROM ranked
    ),
    agg AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(x AS DECIMAL(38,12))) AS sx,
               SUM(CAST(y AS DECIMAL(38,12))) AS sy,
               SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy,
               SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx,
               SUM(CAST(y * y AS DECIMAL(38,12))) AS syy
        FROM pt
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_tokens FROM toks)
    SELECT CAST(n AS BIGINT) AS n_terms,
           total_tokens,
           CASE WHEN n >= 2 AND {vx} > 0.0
           THEN {fin(f"{cov} / {vx}")} END AS slope,
           CASE WHEN n >= 2 AND {vx} > 0.0
           THEN {fin(f"(CAST(sy AS DOUBLE) - ({cov} / {vx})"
                     f" * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)")}
           END AS intercept,
           CASE WHEN n >= 2 AND {vx} > 0.0 AND {vy} > 0.0
           THEN {fin(f"{cov} * {cov} / ({vx} * {vy})")} END AS r2
    FROM agg, tot
    """


def vocab_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    max_groups: int = 64,
) -> DataFrame:
    """Pairwise vocabulary overlap between groups: one row per group
    pair ``(g1 < g2)`` with ``(g1, g2, v1, v2, intersection,
    jaccard_ppm)`` over the groups' DISTINCT word sets — the
    data-mix diagnostic for "how lexically redundant are these two
    sources / languages / snapshots" (near-1 Jaccard between two
    sources means sampling both buys little diversity). ``jaccard_ppm``
    is exact floored integral ppm (house idiom, no IEEE division);
    pairs with an empty intersection are emitted with 0.

    Bounded-pair contract (same discipline as the ANN bounded-query
    lint): the quadratic object is GROUPS², never the corpus — the
    in-plan guard raises at action time when the group count exceeds
    ``max_groups`` instead of silently planning a huge pair join.
    The corpus-scale work is one distinct to the (group, word) grain;
    the word self-join's bucket width is ≤ the group count per word,
    so candidate volume is ≤ vocab × max_groups² — linear in vocab.
    """
    if max_groups < 2:
        raise ValueError(f"vocab_overlap: max_groups {max_groups} < 2")
    from pybabe_spark.functions.text import words

    gw = (
        df.filter(F.col(group_col).isNotNull() & F.col(text_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.explode(words(text_col)).alias("w"),
        )
        .filter(F.col("w") != "")
        .distinct()
    )
    sizes = gw.groupBy("g").agg(F.count(F.lit(1)).alias("v"))
    # in-plan bounded-groups guard: total group count rides a window
    # over the tiny per-group size table (groups rows, not corpus)
    msg = (
        f"vocab_overlap: more than max_groups={max_groups} groups; "
        "raise max_groups only if a quadratic group-pair join is "
        "genuinely intended"
    )
    sizes = sizes.withColumn(
        "__ng", F.count(F.lit(1)).over(Window.partitionBy())
    ).filter(
        F.when(
            F.col("__ng") > max_groups,
            F.raise_error(F.lit(msg)).cast("boolean"),
        ).otherwise(F.lit(True))
    ).drop("__ng")
    inter = (
        gw.alias("a")
        .join(gw.alias("b"), "w")
        .filter(F.col("a.g") < F.col("b.g"))
        .groupBy(F.col("a.g").alias("g1"), F.col("b.g").alias("g2"))
        .agg(F.count(F.lit(1)).alias("intersection"))
    )
    pairs = (
        sizes.select(F.col("g").alias("g1"), F.col("v").alias("v1"))
        .join(
            sizes.select(F.col("g").alias("g2"), F.col("v").alias("v2")),
            F.col("g1") < F.col("g2"),
        )
        .join(inter, ["g1", "g2"], "left")
        .withColumn("intersection", F.coalesce("intersection", F.lit(0)))
    )
    return pairs.select(
        F.col("g1").alias(f"{group_col}_1"),
        F.col("g2").alias(f"{group_col}_2"),
        F.col("v1").cast("bigint"),
        F.col("v2").cast("bigint"),
        F.col("intersection").cast("bigint"),
        F.expr(
            "(intersection * 1000000) div (v1 + v2 - intersection)"
        ).alias("jaccard_ppm"),
    )


def vocab_overlap_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB oracle of :func:`vocab_overlap` — same split/distinct,
    pair join, floored integral ppm."""
    return f"""
    WITH gw AS (
      SELECT DISTINCT {group_col} AS g, w
      FROM (SELECT {group_col}, unnest(string_split({text_col}, ' ')) AS w
            FROM {table}
            WHERE {group_col} IS NOT NULL AND {text_col} IS NOT NULL)
      WHERE w <> ''
    ),
    sizes AS (SELECT g, COUNT(*) AS v FROM gw GROUP BY g),
    inter AS (
      SELECT a.g AS g1, b.g AS g2, COUNT(*) AS intersection
      FROM gw a JOIN gw b ON a.w = b.w AND a.g < b.g
      GROUP BY a.g, b.g
    )
    SELECT s1.g AS {group_col}_1, s2.g AS {group_col}_2,
           CAST(s1.v AS BIGINT) AS v1, CAST(s2.v AS BIGINT) AS v2,
           CAST(COALESCE(i.intersection, 0) AS BIGINT) AS intersection,
           (COALESCE(i.intersection, 0) * 1000000)
             // (s1.v + s2.v - COALESCE(i.intersection, 0)) AS jaccard_ppm
    FROM sizes s1
    JOIN sizes s2 ON s1.g < s2.g
    LEFT JOIN inter i ON i.g1 = s1.g AND i.g2 = s2.g
    """
