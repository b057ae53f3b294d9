"""Training-pipeline queries round 2: quality-rule filters, PII scrub,
deterministic sampling / splitting / mixing.

Oracle-determinism notes (same conventions as queries.py / queries_ml.py):

- Quality fractions are double arithmetic over exact integer inputs with
  a FIXED expression tree (one division, one multiply) — bit-identical
  across engines; no reassociation is possible.
- The sampling family shares one integer hash (operators/sampling.py
  ::hash_bucket) whose SQL mirror is hash_bucket_sql() — pure int64
  arithmetic, so Spark and DuckDB select the exact same rows.
- PII scrub runs on a column BUILT inside the query from doc_id (the
  corpus itself is synthetic word soup with no PII), so the regex paths
  are actually exercised and both engines see identical input strings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pybabe_spark.functions import text as T
from pybabe_spark.operators.sampling import (
    hash_bucket_sql,
    hash_sample,
    mix_sources,
    shuffle_key_sql,
    stratified_sample,
)
from pybabe_spark.queries import register
from pybabe_spark.sources.io import read_table


# ---------------------------------------------------------------------------
# Gopher/C4-style quality rules
# ---------------------------------------------------------------------------

_W = "string_split(text, ' ')"
_BIGRAMS = (
    f"CASE WHEN len({_W}) >= 2 THEN "
    f"list_transform(range(1, len({_W})), i -> {_W}[i] || ' ' || {_W}[i+1]) "
    f"ELSE [text] END"
)

@register(
    "gopher_quality_rules",
    f"""
    WITH g AS (
      SELECT doc_id,
             1.0 - CAST(len(list_distinct(string_split(text, chr(10)))) AS DOUBLE)
                 / CAST(len(string_split(text, chr(10))) AS DOUBLE) AS dup_line_frac,
             LEAST(1.0,
               CAST(list_max(list_transform(list_distinct({_BIGRAMS}),
                      x -> len(list_filter({_BIGRAMS}, y -> y = x)))) * 2 AS DOUBLE)
                   / CAST(len({_W}) AS DOUBLE)) AS top_bigram_frac,
             CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
                 / CAST(len({_W}) AS DOUBLE) AS symbol_word_ratio,
             CAST(list_sum(list_transform({_W}, x -> length(x))) AS DOUBLE)
                 / CAST(len({_W}) AS DOUBLE) AS mean_word_len,
             len({_W}) AS n_words
      FROM documents WHERE doc_id < 2000
    )
    SELECT doc_id, dup_line_frac, top_bigram_frac, symbol_word_ratio,
           (dup_line_frac <= 0.30
            AND (n_words < 50 OR top_bigram_frac <= 0.18)
            AND symbol_word_ratio <= 0.10
            AND mean_word_len BETWEEN 3.0 AND 10.0) AS passes
    FROM g
    """,
)
def q_gopher_quality(spark, sf_dir):
    """Repetition-rule document filter (functions/text.py
    ::gopher_quality_flags; thresholds from Gopher arXiv:2112.11446
    §A.2). One narrow projection pass — no shuffle, no UDF; at 100 TB
    this is a map-only stage that fuses into the scan."""
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    flags = T.gopher_quality_flags("text")
    return docs.select(
        "doc_id",
        T.dup_line_fraction("text").alias("dup_line_frac"),
        T.top_ngram_fraction("text", 2).alias("top_bigram_frac"),
        T.symbol_word_ratio("text").alias("symbol_word_ratio"),
        (
            flags["lines_ok"] & flags["bigram_ok"]
            & flags["symbols_ok"] & flags["wlen_ok"]
        ).alias("passes"),
    )


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------

_MK_CONTACT = (
    "concat('reach user', CAST(doc_id AS VARCHAR), ' at u', "
    "CAST(doc_id AS VARCHAR), '@mail.example.com or +33 1 4', "
    "CAST(doc_id % 10 AS VARCHAR), ' 55 66 77 host 10.0.', "
    "CAST(doc_id % 256 AS VARCHAR), '.7 ok')"
)

@register(
    "pii_scrub_docs",
    f"""
    WITH c AS (
      SELECT doc_id, {_MK_CONTACT} AS contact
      FROM documents WHERE doc_id < 5000
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(contact,
             '{T.PII_PATTERNS["EMAIL"]}', '<EMAIL>', 'g'),
             '{T.PII_PATTERNS["IP"]}', '<IP>', 'g'),
             '{T.PII_PATTERNS["PHONE"]}', '<PHONE>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(contact, '{T.PII_PATTERNS["EMAIL"]}'))
              + len(regexp_extract_all(contact, '{T.PII_PATTERNS["IP"]}'))
              + len(regexp_extract_all(contact, '{T.PII_PATTERNS["PHONE"]}'))
             AS BIGINT) AS n_pii
    FROM c
    """,
)
def q_pii_scrub(spark, sf_dir):
    """PII scrub + count (functions/text.py::pii_scrub): chained
    JVM-regex replaces in whole-stage codegen; the contact string is
    synthesized from doc_id so both engines scrub identical input."""
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 5000)
    c = docs.select("doc_id", F.expr(_MK_CONTACT.replace("VARCHAR", "STRING")).alias("contact"))
    return c.select(
        "doc_id",
        T.pii_scrub("contact").alias("scrubbed"),
        T.pii_count("contact").cast("bigint").alias("n_pii"),
    )


# ---------------------------------------------------------------------------
# Deterministic sampling / split / mix
# ---------------------------------------------------------------------------

@register(
    "hash_sample_orders",
    f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE {hash_bucket_sql('o_orderkey')} < 100000
    """,
)
def q_hash_sample(spark, sf_dir):
    """10% deterministic sample by key hash (operators/sampling.py
    ::hash_sample). Map-side filter, no RNG, no shuffle — at 100 TB it's
    a scan predicate; df.sample can't promise the same rows across task
    retries, this can."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return hash_sample(orders, "o_orderkey", 0.1)


@register(
    "stratified_sample_segment",
    f"""
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer
    WHERE (c_mktsegment = 'BUILDING' AND {hash_bucket_sql('c_custkey')} < 500000)
       OR (c_mktsegment = 'MACHINERY' AND {hash_bucket_sql('c_custkey')} < 200000)
       OR (c_mktsegment = 'AUTOMOBILE' AND {hash_bucket_sql('c_custkey')} < 50000)
    GROUP BY c_mktsegment
    """,
)
def q_stratified_sample(spark, sf_dir):
    """Per-stratum deterministic rates (operators/sampling.py
    ::stratified_sample): one CASE-over-bucket filter; strata without a
    rate drop out — the class-rebalancing step of a training mix."""
    cust = read_table(spark, sf_dir, "customer")
    out = stratified_sample(
        cust, "c_mktsegment", "c_custkey",
        {"BUILDING": 0.5, "MACHINERY": 0.2, "AUTOMOBILE": 0.05},
    )
    return out.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))


@register(
    "global_shuffle_docs",
    f"""
    SELECT doc_id, {shuffle_key_sql('doc_id', 42)} AS shuffle_key
    FROM documents
    """,
)
def q_global_shuffle(spark, sf_dir):
    """Deterministic seeded corpus shuffle (operators/sampling.py
    ::global_shuffle): ORDER BY md5(seed:key) — Spark executes it as a
    range-partitioned external merge sort (no single-task funnel), and
    the permutation is a pure function of (data, seed), so every epoch,
    retry, and engine replays the identical order. The oracle verifies
    the full position-key mapping; the ordering/sharding mechanics are
    plan-asserted in tests/test_scale_ops.py."""
    from pybabe_spark.operators.sampling import global_shuffle, shuffle_key

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    return global_shuffle(docs, "doc_id", seed=42).select(
        "doc_id", shuffle_key("doc_id", 42).alias("shuffle_key")
    )


@register(
    "train_test_split_counts",
    f"""
    SELECT CASE WHEN {hash_bucket_sql('doc_id')} < 100000
                THEN 'test' ELSE 'train' END AS split,
           COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents GROUP BY 1
    """,
)
def q_train_test_split(spark, sf_dir):
    """Deterministic 90/10 corpus split (operators/sampling.py
    ::train_test_split): disjoint + exhaustive by construction; the
    split is a property of the data, recomputable anywhere."""
    from pybabe_spark.operators.sampling import train_test_split

    docs = read_table(spark, sf_dir, "documents")
    train, test = train_test_split(docs, "doc_id", 0.1)
    return (
        train.withColumn("split", F.lit("train"))
        .unionByName(test.withColumn("split", F.lit("test")))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars"),
        )
    )


@register(
    "mix_sources_docs",
    f"""
    WITH mixed AS (
      SELECT * FROM documents
      WHERE source = 'src0' AND {hash_bucket_sql('doc_id')} < 1000000
      UNION ALL
      SELECT * FROM documents
      WHERE source <> 'src0' AND {hash_bucket_sql('doc_id')} < 250000
    )
    SELECT source, COUNT(*) AS n FROM mixed GROUP BY source
    """,
)
def q_mix_sources(spark, sf_dir):
    """Weighted corpus blend (operators/sampling.py::mix_sources): 100%
    of the curated source + 25% of the rest, unioned narrow — the
    data-mixing step ahead of tokenization."""
    docs = read_table(spark, sf_dir, "documents")
    mixed = mix_sources(
        [
            (docs.filter(F.col("source") == "src0"), 1.0),
            (docs.filter(F.col("source") != "src0"), 0.25),
        ],
        "doc_id",
    )
    return mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n"))


def _temperature_sql() -> str:
    from pybabe_spark.operators.sampling import temperature_resample_sql

    return temperature_resample_sql(
        "documents", "lang", "doc_id", budget=200, alpha=0.5,
        select_cols="doc_id, lang",
    )


@register("temperature_resample_docs", _temperature_sql())
def q_temperature_resample(spark, sf_dir):
    """Temperature (α=0.5) resampling of the corpus across languages
    (operators/sampling.py::temperature_resample): per-language budgets
    ∝ count^α — the mBERT/UNIMAX low-resource upweighting step — with
    deterministic shuffle-key selection. Scale shape: one group-count
    aggregation, a broadcast ≤|langs|-row allocation table, a window
    partitioned by language (exact path; the map-side hash-fraction
    path handles giant groups)."""
    from pybabe_spark.operators.sampling import temperature_resample

    docs = read_table(spark, sf_dir, "documents")
    out = temperature_resample(docs, "lang", "doc_id", budget=200, alpha=0.5)
    return out.select("doc_id", "lang")


def _token_budget_sql() -> str:
    from pybabe_spark.operators.sampling import token_budget_sample_sql

    return token_budget_sample_sql(
        "documents", "lang", "doc_id", "n_chars", budget=10_000,
        columns="doc_id, lang, n_chars",
    )


@register("token_budget_sample_docs", _token_budget_sql())
def q_token_budget_sample(spark, sf_dir):
    """Per-language token-budget fill
    (operators/sampling.py::token_budget_sample): each language keeps
    documents in deterministic md5-shuffle order until 10k stored
    length units are consumed (overshoot ≤ 1 doc) — the exact-budget
    half of data mixing that row-count resampling can't express.
    Scale shape: one language-partitioned cumulative window, groups
    fill in parallel, no global sort."""
    from pybabe_spark.operators.sampling import token_budget_sample

    docs = read_table(spark, sf_dir, "documents")
    out = token_budget_sample(docs, "lang", "doc_id", "n_chars", 10_000)
    return out.select("doc_id", "lang", "n_chars")


# ---------------------------------------------------------------------------
# Keyed merges
# ---------------------------------------------------------------------------

@register(
    "upsert_customer_balances",
    """
    WITH updates AS (
      SELECT c_custkey, c_nationkey, c_acctbal + 1000.0 AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0
    ),
    base AS (
      SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment FROM customer
    ),
    merged AS (
      SELECT * FROM base
      WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
      UNION ALL SELECT * FROM updates
    )
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
    FROM merged GROUP BY c_mktsegment
    """,
)
def q_upsert(spark, sf_dir):
    """SCD1 row-level merge (operators/merge.py::upsert): updates win on
    key collision, base passes through, new keys append — one anti-join
    + narrow union; update side broadcasts when small."""
    from pybabe_spark.operators.merge import upsert

    base = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    updates = base.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 1000.0
    )
    merged = upsert(base, updates, "c_custkey")
    return merged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("bal"),
    )


@register(
    "dedup_against_seen",
    """
    WITH seen AS (
      SELECT DISTINCT md5(trim(lower(regexp_replace(text, ' +', ' ', 'g')))) AS ck
      FROM documents WHERE doc_id % 5 = 0
    ),
    batch AS (
      SELECT doc_id,
             md5(trim(lower(regexp_replace(text, ' +', ' ', 'g')))) AS ck
      FROM documents
    )
    SELECT b.doc_id FROM batch b WHERE b.ck NOT IN (SELECT ck FROM seen)
    """,
)
def q_dedup_against(spark, sf_dir):
    """Incremental corpus dedup (operators/merge.py::dedup_against): the
    new batch drops rows whose content key exists in the historical seen
    set — the daily-ingest counterpart of full-corpus dedup. (The corpus
    has no exact duplicates, so the seen set is every 5th doc's key,
    guaranteeing the anti-join really drops 20% of the batch.)"""
    from pybabe_spark.operators.merge import dedup_against

    docs = read_table(spark, sf_dir, "documents")
    seen = docs.filter(F.col("doc_id") % 5 == 0).select(
        T.exact_key("text").alias("ck")
    )
    batch = docs.select("doc_id", T.exact_key("text").alias("ck"))
    return dedup_against(batch, seen, "ck").select("doc_id")


# ---------------------------------------------------------------------------
# Heavy hitters
# ---------------------------------------------------------------------------

@register(
    "heavy_hitters_custkey",
    """
    SELECT o_custkey, COUNT(*) AS n
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 18
    """,
)
def q_heavy_hitters(spark, sf_dir):
    """Exact frequent-value aggregation (operators/sketch.py
    ::exact_heavy_hitters) — the oracle-checkable definition; the
    fixed-memory sketch path (heavy_hitters, KPS one-pass) is pinned
    against it in tests/test_scale_ops.py."""
    from pybabe_spark.operators.sketch import exact_heavy_hitters

    orders = read_table(spark, sf_dir, "orders")
    return exact_heavy_hitters(orders, "o_custkey", 18)


def _ghh_sql():
    from pybabe_spark.operators.sketch import group_heavy_hitters_sql

    return group_heavy_hitters_sql(
        "SELECT lang, source FROM documents", "lang", "source",
        support=0.05,
    )


@register("group_heavy_hitters_docs", _ghh_sql())
def q_group_heavy_hitters(spark, sf_dir):
    """Per-group heavy hitters: sources exceeding 5% of their
    LANGUAGE's documents (operators/sketch.py::group_heavy_hitters) —
    Misra-Gries candidates per partition per group via one Arrow
    mapInPandas pass (no false negatives by the KPS pigeonhole), then
    an exact semi-join confirm; the shuffle never carries the full
    distinct (group, value) key space. Output matches the exact
    definition value-for-value."""
    from pybabe_spark.operators.sketch import group_heavy_hitters

    docs = read_table(spark, sf_dir, "documents")
    return group_heavy_hitters(docs, "lang", "source", support=0.05)


# ---------------------------------------------------------------------------
# URL parsing
# ---------------------------------------------------------------------------

_MK_URL = (
    "concat('https://site', CAST(user_id % 5 AS VARCHAR), "
    "'.example.com/page/', event_type, '?uid=', CAST(user_id AS VARCHAR), "
    "'&v=', CAST(event_id % 7 AS VARCHAR))"
)

@register(
    "url_parse_events",
    f"""
    WITH u AS (SELECT event_id, {_MK_URL} AS url FROM events)
    SELECT event_id,
           regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1) AS protocol,
           regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)', 1) AS host,
           regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]uid=([^&#]*)', 1) AS uid
    FROM u
    """,
)
def q_url_parse(spark, sf_dir):
    """URL decomposition + query-param extraction
    (functions/enrich.py::url_parse/url_param — the log-line enrichment
    family next to user_agent/geoip; regexes shared verbatim with the
    oracle so parity is by construction). Map-only codegen stage."""
    from pybabe_spark.functions.enrich import url_param, url_parse

    ev = read_table(spark, sf_dir, "events")
    u = ev.select(
        "event_id", F.expr(_MK_URL.replace("VARCHAR", "STRING")).alias("url")
    )
    p = url_parse("url")
    return u.select(
        "event_id",
        p["protocol"].alias("protocol"),
        p["host"].alias("host"),
        p["path"].alias("path"),
        url_param("url", "uid").alias("uid"),
    )


# ---------------------------------------------------------------------------
# Event throttling
# ---------------------------------------------------------------------------

@register(
    "throttle_user_events",
    """
    WITH g AS (
      SELECT event_id, user_id, ts,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT event_id, user_id
    FROM g WHERE gap_us IS NULL OR gap_us > 600 * 1000000
    """,
)
def q_throttle(spark, sf_dir):
    """Per-user event rate limiting (operators/relational.py::throttle):
    drop events within 10 minutes of the user's previous event — one
    window, one shuffle on the key."""
    from pybabe_spark.operators.relational import throttle

    ev = read_table(spark, sf_dir, "events")
    return throttle(ev, "user_id", "ts", 600, tiebreak="event_id").select(
        "event_id", "user_id"
    )


def _curriculum_sql() -> str:
    """Band + in-band shuffle-key mapping for the curriculum order —
    the oracle verifies the full (band, position-key) assignment; the
    range-sort mechanics are plan-asserted in tests (the
    global_shuffle_docs pattern, which the driver compare's
    order-insensitive hashing requires)."""
    from pybabe_spark.operators.sampling import curriculum_band_sql
    from pybabe_spark.queries_ml import _QUALITY_SQL

    band = curriculum_band_sql(
        f"CAST({_QUALITY_SQL} AS DOUBLE)", [0.3, 0.5, 0.7]
    )
    return f"""
    SELECT doc_id, {band} AS band,
           {shuffle_key_sql('doc_id', 7)} AS shuffle_key
    FROM documents
    """


def _clip_pack_curriculum_sql() -> str:
    """The full clip → pack → curriculum composition replayed in SQL:
    the middle-clip as list slices, the next-fit packing recurrence as
    a recursive CTE over CLIPPED token counts (the pack_tokens_docs
    oracle, rebased onto the clip CTE), per-pack quality as an exact
    decimal sum with ONE raw IEEE division (house convention: never
    re-round an exact-decimal ÷ small-int quotient), then the band +
    shuffle-key mapping of the curriculum oracle keyed by pack."""
    from pybabe_spark.operators.sampling import (
        curriculum_band_sql,
        hash_bucket_sql,
        shuffle_key_sql,
    )
    from pybabe_spark.queries_ml import _QUALITY_SQL

    bucket = f"(({hash_bucket_sql('doc_id', 'int')}) % {_CPC_BUCKETS})"
    tokens = "len(regexp_extract_all(text, '([A-Za-z0-9]+|[^A-Za-z0-9 ])', 1))"
    band = curriculum_band_sql("pack_q", _CPC_BANDS)
    return f"""
    WITH RECURSIVE w AS (
      SELECT doc_id, text, string_split(COALESCE(text, ''), ' ') AS ws
      FROM documents),
    clip AS (
      SELECT doc_id,
             CASE WHEN len(ws) <= {_CPC_MAX_WORDS} THEN COALESCE(text, '')
                  ELSE array_to_string(
                         list_concat(
                           list_slice(ws, 1, {_CPC_HEAD}),
                           list_slice(ws, len(ws) - {_CPC_TAIL - 1}, len(ws))),
                         ' ')
             END AS text
      FROM w),
    feat AS (
      SELECT doc_id, {bucket} AS bucket,
             CAST({tokens} AS BIGINT) AS t,
             {_QUALITY_SQL} AS q
      FROM clip),
    x AS (
      SELECT doc_id, bucket, t, q,
             ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
      FROM feat),
    r AS (
      SELECT bucket, rn, doc_id, t, q, t AS acc, CAST(0 AS BIGINT) AS pack
      FROM x WHERE rn = 1
      UNION ALL
      SELECT x.bucket, x.rn, x.doc_id, x.t, x.q,
             CASE WHEN r.acc + x.t > {_CPC_BUDGET} THEN x.t
                  ELSE r.acc + x.t END,
             CASE WHEN r.acc + x.t > {_CPC_BUDGET} THEN r.pack + 1
                  ELSE r.pack END
      FROM r JOIN x ON x.bucket = r.bucket AND x.rn = r.rn + 1
    ),
    packs AS (
      SELECT CAST(bucket AS INT) AS bucket, pack AS pack_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(t) AS BIGINT) AS pack_tokens,
             CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS pack_q
      FROM r GROUP BY bucket, pack
    )
    SELECT bucket, pack_id, n_docs, pack_tokens,
           {band} AS band,
           {shuffle_key_sql(
               "CAST(bucket AS VARCHAR) || ':' || CAST(pack_id AS VARCHAR)",
               _CPC_SEED,
           )} AS shuffle_key
    FROM packs
    """


_CPC_MAX_WORDS, _CPC_HEAD, _CPC_TAIL = 40, 20, 20
_CPC_BUDGET, _CPC_BUCKETS, _CPC_SEED = 128, 8, 11
# quartile-ish cuts of the measured per-pack mean-quality distribution
# (sf0.01 range 0.40-0.475) — fixed data-independent constants, chosen so
# every band is populated and the ordering is exercised for real
_CPC_BANDS = [0.44, 0.455, 0.47]


@register("clip_pack_curriculum_docs", _clip_pack_curriculum_sql())
def q_clip_pack_curriculum(spark, sf_dir):
    """The real pre-training data path, composed end to end (VERDICT r5
    next-round item 7): middle-clip every document to 40 words →
    token-count the clipped text → next-fit pack into ≤128-token
    sequences (deterministic hash buckets, Arrow-batched state) →
    per-pack mean quality → curriculum-order the PACKS (fixed bands,
    seeded in-band shuffle, range sort). Proves the three round-5
    operators compose deterministically: the oracle replays clip, the
    packing recurrence, the decimal quality sum, and the (band,
    shuffle-key) mapping value-for-value."""
    from pybabe_spark.functions.text import quality_score, token_count
    from pybabe_spark.operators.packing import clip_documents, pack_tokens
    from pybabe_spark.operators.sampling import (
        curriculum_band,
        curriculum_order,
        shuffle_key,
    )

    docs = read_table(spark, sf_dir, "documents")
    feat = clip_documents(
        docs, max_words=_CPC_MAX_WORDS, mode="middle"
    ).select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        quality_score("text").cast("decimal(18,6)").alias("__q"),
    )
    packs = pack_tokens(
        feat, budget=_CPC_BUDGET, tokens_col="n_tokens",
        n_buckets=_CPC_BUCKETS,
    )
    # equi-join pack assignments back to the per-doc features (both
    # corpus-sized — a plain shuffled hash join, linear at any scale)
    per_pack = (
        packs.join(feat, "doc_id")
        .groupBy("bucket", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
            # exact decimal sum, then ONE raw IEEE division — identical
            # bits on both engines (house determinism convention)
            (
                F.sum("__q").cast("decimal(28,6)").cast("double")
                / F.count(F.lit(1))
            ).alias("pack_q"),
        )
        .withColumn(
            "pack_key",
            F.concat_ws(
                ":",
                F.col("bucket").cast("string"),
                F.col("pack_id").cast("string"),
            ),
        )
    )
    ordered = curriculum_order(
        per_pack, "pack_q", _CPC_BANDS, "pack_key", seed=_CPC_SEED
    )
    return ordered.select(
        "bucket",
        "pack_id",
        "n_docs",
        "pack_tokens",
        curriculum_band("pack_q", _CPC_BANDS).alias("band"),
        shuffle_key("pack_key", _CPC_SEED).alias("shuffle_key"),
    )


@register("curriculum_order_docs", _curriculum_sql())
def q_curriculum_order(spark, sf_dir):
    """Curriculum epoch ordering (operators/sampling.py::
    curriculum_order): fixed quality-score bands (no global quantile
    pass), deterministic md5 shuffle inside each band, range-partitioned
    sort — reproducible on any cluster. The oracle checks the exact
    (band, key) mapping for every doc; ordering mechanics are
    plan-asserted."""
    from pybabe_spark.functions.text import quality_score
    from pybabe_spark.operators.sampling import (
        curriculum_band,
        curriculum_order,
        shuffle_key,
    )

    # band the DECIMAL(18,6)-rounded score — the representation the
    # oracle's _QUALITY_SQL bakes in; banding the raw double instead
    # could split a boundary-adjacent doc across engines
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "__q", quality_score("text").cast("decimal(18,6)").cast("double")
    )
    ordered = curriculum_order(docs, "__q", [0.3, 0.5, 0.7], "doc_id", seed=7)
    return ordered.select(
        "doc_id",
        curriculum_band("__q", [0.3, 0.5, 0.7]).alias("band"),
        shuffle_key("doc_id", 7).alias("shuffle_key"),
    )


@register(
    "dedup_against_bloom_docs",
    """
    WITH seen AS (
      SELECT DISTINCT md5(trim(lower(regexp_replace(text, ' +', ' ', 'g')))) AS ck
      FROM documents WHERE doc_id % 5 = 0
    ),
    batch AS (
      SELECT doc_id,
             md5(trim(lower(regexp_replace(text, ' +', ' ', 'g')))) AS ck
      FROM documents
    )
    SELECT b.doc_id FROM batch b WHERE b.ck NOT IN (SELECT ck FROM seen)
    """,
)
def q_dedup_against_bloom(spark, sf_dir):
    """Bloom-prefiltered incremental dedup (operators/bloom.py
    ::dedup_against_bloom): SAME oracle and SAME result as
    `dedup_against_seen` — the Bloom filter is a transparent scale
    optimization (misses skip the anti-join shuffle entirely; hits are
    confirmed exactly), and this key certifies that transparency
    value-for-value against the plain anti-join's oracle."""
    from pybabe_spark.operators.bloom import dedup_against_bloom

    docs = read_table(spark, sf_dir, "documents")
    seen = docs.filter(F.col("doc_id") % 5 == 0).select(
        T.exact_key("text").alias("ck")
    )
    batch = docs.select("doc_id", T.exact_key("text").alias("ck"))
    return dedup_against_bloom(batch, seen, "ck", m_bits=1 << 20, k=5).select(
        "doc_id"
    )


@register(
    "rank_normalize_docs",
    """
    SELECT doc_id, n_chars,
           CASE WHEN COUNT(n_chars) OVER (PARTITION BY lang) > 1 THEN
             CAST(1000000 AS BIGINT)
             * (ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY n_chars ASC, doc_id ASC) - 1)
             // (COUNT(n_chars) OVER (PARTITION BY lang) - 1)
           ELSE CAST(0 AS BIGINT) END AS n_chars_pctile_ppm
    FROM documents
    """,
)
def q_rank_normalize(spark, sf_dir):
    """Rank-based feature scaling (operators/sampling.py::
    rank_normalize): per-language percent-rank of doc length as exact
    integer ppm — outlier-immune normalization for quality/curriculum
    signals; one key-partitioned window pass, unique doc_id tiebreak."""
    from pybabe_spark.operators.sampling import rank_normalize

    docs = read_table(spark, sf_dir, "documents")
    return rank_normalize(
        docs, "n_chars", by="lang", tie_col="doc_id"
    ).select("doc_id", "n_chars", "n_chars_pctile_ppm")
