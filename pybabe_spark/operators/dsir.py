"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Given a huge raw corpus and a small high-quality target corpus, score
every raw document by how target-like its hashed n-gram distribution is
and resample with Gumbel-top-k — the standard recipe for carving a
pretraining mix out of a web-scale crawl. Beyond-reference (the
reference has no corpus-selection surface; nearest primitive is
pybabe/filter_.py row filtering).

Pipeline, all hash-agg + equi-join (linear, no collect, no Python):

1. :func:`hashed_ngram_features` — one row per word-bigram occurrence,
   bucketed into ``buckets`` hashed features with the registry's
   cross-engine md5 bucket (operators/sampling.py::hash_bucket);
   :func:`doc_feature_profile` aggregates it to the compact
   (id, bucket, occurrences) form every downstream stage consumes, so
   the md5 hash is evaluated once per occurrence and the profile's
   exchange is physically shared (ReuseExchange) between the bucket
   models and the scoring join.
2. :func:`dsir_log_weights` — per-bucket add-alpha unigram models of
   the target and raw feature distributions (totals derived from the
   count tables, never a second corpus pass), then per-doc
   log w(x) = Σ_f [ln p_target(f) − ln p_raw(f)] over the doc's
   feature occurrences. The per-bucket terms are DECIMAL(18,6) per the
   registry convention and enter the sum as exact
   occurrences × term products, so the sum is order-independent.
3. :func:`dsir_resample` — deterministic Gumbel-top-k: uniform noise
   from the seeded md5 of the doc id (identical in any engine, any
   retry), g = log_weight − ln(−ln(u)), take the k largest.

Scale shapes: the feature space is a FIXED ``buckets``-sized table
(default 10k rows), so both per-bucket models broadcast; scoring is one
broadcast join over the exploded raw corpus plus one per-doc hash
aggregation. The target corpus is small by construction. Resampling is
a TakeOrderedAndProject top-k, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pybabe_spark.operators._util import attach_scalars
from pybabe_spark.operators.lm import bigram_rows
from pybabe_spark.operators.sampling import hash_bucket, hash_bucket_sql


def hashed_ngram_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
) -> DataFrame:
    """(id, bucket) per word-bigram occurrence; bucket ∈ [0, buckets)."""
    bg = bigram_rows(df, id_col, text_col)
    feat = F.concat_ws(" ", F.col("w1"), F.col("w2"))
    return bg.select(
        F.col(id_col),
        F.pmod(hash_bucket(feat, "string"), F.lit(buckets)).alias("bucket"),
    )


def feature_sql(buckets: int) -> str:
    """DuckDB mirror of the feature bucket for a (w1, w2) pair — the
    identical md5 arithmetic, so oracle and engine bucket identically."""
    key = "(w1 || ' ' || w2)"
    return f"({hash_bucket_sql(key, 'string')}) % {buckets}"


def doc_feature_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
) -> DataFrame:
    """Compact per-doc feature profile: (id, bucket, nf occurrences).

    The md5 bucket hash — the expensive expression — is evaluated
    exactly once per bigram occurrence here; every downstream consumer
    (bucket models, scoring) works on this aggregated form, and
    consumers sharing the profile share one physical exchange
    (ReuseExchange) instead of re-exploding the corpus.

    An under-partitioned input (a single small file) would run the
    whole explode+hash pass in ONE task while the rest of the machine
    idles — spread the scan first (the infra.profile idiom; a no-op on
    well-partitioned input, and at cluster scale inputs arrive in many
    splits anyway).
    """
    from pybabe_spark.plans.introspect import (
        default_parallelism,
        num_partitions,
    )

    par = default_parallelism(df.sparkSession)
    have = num_partitions(df)
    if have is not None and have < min(8, par):
        df = df.repartition(min(8, par))
    return (
        hashed_ngram_features(df, id_col, text_col, buckets)
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("nf"))
    )


def _bucket_model(profile: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Per-bucket occurrence counts + 1-row total, both DERIVED from the
    profile: the total is the sum over the ≤buckets count rows, never a
    second pass over the corpus. The total coalesces to 0 on an EMPTY
    corpus — sum-over-nothing is NULL, which would otherwise NULL every
    downstream log-ratio and silently wipe the resample; with n = 0 the
    add-alpha model degrades to the uniform distribution instead (an
    empty target carries no information, so every doc weighs the
    same)."""
    counts = profile.groupBy("bucket").agg(F.sum("nf").alias("c"))
    total = counts.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n"))
    return counts, total


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    alpha: float = 1.0,
    raw_profile: DataFrame | None = None,
    target_profile: DataFrame | None = None,
    target_model: "tuple[DataFrame, DataFrame] | None" = None,
) -> DataFrame:
    """Per-raw-document DSIR importance log-weight.

    Output: (id, n_feats, log_weight); docs with no bigram features get
    ``n_feats = 0`` and NULL weight (no evidence — the caller decides).

    p(f) = (c_f + alpha) / (N + alpha * buckets) under each corpus; the
    weight sums ln p_target − ln p_raw over the doc's occurrences. Both
    per-bucket models are ≤ ``buckets`` rows and broadcast to the
    scoring join.
    """
    # profile passthrough (the classifier's train/score idiom): a
    # caller whose target is a SUBSET of raw can materialize the raw
    # profile once and derive the target's as a semi-join on its ids —
    # one corpus explode+hash instead of two
    raw_prof = (
        raw_profile
        if raw_profile is not None
        else doc_feature_profile(raw, id_col, text_col, buckets)
    )
    cr, nr = _bucket_model(raw_prof)
    if target_model is not None:
        # a stored/precomputed (counts, total) target model — see
        # save_dsir_target — skips the target corpus entirely
        ct, nt = target_model
    else:
        tgt_prof = (
            target_profile
            if target_profile is not None
            else doc_feature_profile(target, id_col, text_col, buckets)
        )
        ct, nt = _bucket_model(tgt_prof)
    totals = attach_scalars(
        nr.withColumnRenamed("n", "nr"), nt.withColumnRenamed("n", "nt")
    )
    ratio = attach_scalars(
        cr.join(ct.withColumnRenamed("c", "ct"), "bucket", "left"), totals
    ).select(
        "bucket",
        (
            F.log(
                (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(alpha))
                / (F.col("nt") + F.lit(alpha) * F.lit(buckets))
            )
            - F.log(
                (F.col("c") + F.lit(alpha))
                / (F.col("nr") + F.lit(alpha) * F.lit(buckets))
            )
        )
        .cast("decimal(18,6)")
        .alias("__lr"),
    )
    # nf × lr is an exact decimal multiply — identical to summing the
    # per-occurrence DECIMAL(18,6) term nf times, which is what the
    # DuckDB oracle replays
    scored = raw_prof.join(F.broadcast(ratio), "bucket")
    agg = scored.groupBy(id_col).agg(
        F.sum("nf").alias("n_feats"),
        F.sum(F.col("nf") * F.col("__lr")).cast("decimal(28,6)").alias("__sum"),
    )
    return (
        raw.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
            F.col("__sum").cast("double").alias("log_weight"),
        )
    )


def gumbel_key(
    weight_col: str, id_col: str, seed: int = 0
) -> F.Column:
    """DECIMAL(18,6)-rounded Gumbel perturbation g = w − ln(−ln(u)) with
    u ∈ (0, 1) derived from the seeded md5 of the id — the same
    deterministic-noise idiom as sampling.py::shuffle_key, reproduced
    exactly by :func:`gumbel_key_sql`."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{seed}:"),
                    F.coalesce(F.col(id_col).cast("string"), F.lit("")),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(2**60))
    return (
        (F.col(weight_col) - F.log(-F.log(u)))
        .cast("decimal(18,6)")
        .cast("double")
    )


def gumbel_key_sql(weight_col: str, id_col: str, seed: int = 0) -> str:
    """The identical Gumbel key as ANSI SQL (DuckDB oracle form)."""
    h = (
        f"CAST(('0x' || substr(md5('{seed}:' || "
        f"COALESCE(CAST({id_col} AS VARCHAR), '')), 1, 15)) AS BIGINT)"
    )
    u = f"((CAST({h} AS DOUBLE) + 0.5) / {float(2**60)!r})"
    return (
        f"CAST(CAST(({weight_col} - ln(-ln({u}))) AS DECIMAL(18,6)) "
        f"AS DOUBLE)"
    )


def dsir_resample(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
    seed: int = 0,
) -> DataFrame:
    """Gumbel-top-k sample-without-replacement ∝ exp(weight): keep the k
    rows with the largest perturbed keys (ties broken by id, NULL
    weights excluded — they carry no evidence). Physical plan is
    TakeOrderedAndProject — no global sort at any scale."""
    g = gumbel_key(weight_col, id_col, seed)
    return (
        weights.filter(F.col(weight_col).isNotNull())
        .withColumn("gumbel", g)
        .orderBy(F.col("gumbel").desc(), F.col(id_col))
        .limit(k)
    )


def save_dsir_target(
    target: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    mode: str = "overwrite",
) -> None:
    """Persist the TARGET distribution's bucket model — the fixed
    artifact a production DSIR deployment computes once from the
    high-quality target corpus and reuses against every raw batch.
    Layout: ``counts/`` (bucket, c), ``total/`` one row (n), and a
    one-row ``params/`` pinning the feature-bucket count (mixing bucket
    spaces silently mis-scores — the save_classifier /
    build_minhash_index contract). Model size ≤ buckets rows, never
    corpus-sized."""
    import posixpath

    prof = doc_feature_profile(target, id_col, text_col, buckets)
    counts, total = _bucket_model(prof)
    counts.write.mode(mode).parquet(posixpath.join(path, "counts"))
    total.write.mode(mode).parquet(posixpath.join(path, "total"))
    target.sparkSession.createDataFrame(
        [(int(buckets),)], "buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(
        posixpath.join(path, "params")
    )


def load_dsir_target(spark, path: str):
    """(target_model, buckets) for :func:`dsir_log_weights`'s
    ``target_model=`` / ``buckets=`` parameters. The 1-row total reads
    back with ``limit(1)`` so plan_lint's maxRows proof of the scalar
    attach survives the parquet roundtrip (the lm.load_lm precaution).
    """
    import posixpath

    prows = spark.read.parquet(posixpath.join(path, "params")).collect()
    if len(prows) != 1:
        raise ValueError(
            f"load_dsir_target: model at {path!r} has {len(prows)} params "
            "rows (expected exactly 1) — rewrite it with save_dsir_target"
        )
    counts = spark.read.parquet(posixpath.join(path, "counts"))
    total = spark.read.parquet(posixpath.join(path, "total")).limit(1)
    return (counts, total), int(prows[0]["buckets"])


def feature_hash_encode(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """Hashing-trick dense encoder: each document becomes a fixed-width
    ``array<bigint>`` of hashed-bigram counts — the vocabulary-free
    numeric vector linear models / kNN / clustering consume, built
    entirely JVM-side (no UDF): the :func:`doc_feature_profile` hash
    agg (one md5 per bigram occurrence), then ``map_from_entries`` +
    a ``transform(sequence(...))`` densification per doc. Documents
    with no bigrams (empty/NULL/one-word text) encode as the zero
    vector — they are kept via a left join back to the id universe, so
    the output is exactly one row per input document.

    Output: ``(id, features array<bigint>)``, ``size = dim``.

    Scale shape: one explode+hash agg to the (doc, bucket) grain, one
    collect_list per doc bounded by ``dim`` entries, one left join on
    the doc id. At 100 TB this is the standard pre-embedding featurizer
    — everything map-side combinable, the widest row is ``dim`` longs.
    """
    if not 2 <= dim <= 65536:
        raise ValueError(f"feature_hash_encode: dim {dim} outside [2, 65536]")
    prof = doc_feature_profile(df, id_col, text_col, dim)
    vecs = prof.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket"), F.col("nf")))
        ).alias("__m")
    )
    ids = df.select(F.col(id_col)).distinct()
    return ids.join(vecs, id_col, "left").select(
        id_col,
        F.expr(
            f"transform(sequence(0, {dim - 1}),"
            " i -> coalesce(__m[i], CAST(0 AS BIGINT)))"
        ).alias("features"),
    )


def feature_hash_encode_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    table: str = "documents",
) -> str:
    """DuckDB oracle of :func:`feature_hash_encode` — identical md5
    bucket arithmetic, map densified by ``list_transform(range(dim))``
    (``map_extract`` yields a list; empty → 0)."""
    return f"""
    WITH __w AS (SELECT {id_col}, string_split({text_col}, ' ') AS ws
                 FROM {table}),
    __bgx AS (
      SELECT {id_col}, unnest(list_transform(range(1, len(ws)),
               i -> struct_pack(w1 := ws[i], w2 := ws[i + 1]))) AS b
      FROM __w
    ),
    __bg AS (SELECT {id_col}, b.w1 AS w1, b.w2 AS w2 FROM __bgx),
    f AS (SELECT {id_col}, {feature_sql(dim)} AS bucket FROM __bg),
    prof AS (
      SELECT {id_col}, bucket, CAST(COUNT(*) AS BIGINT) AS nf
      FROM f GROUP BY {id_col}, bucket
    ),
    m AS (
      SELECT {id_col},
             map_from_entries(list(struct_pack(k := bucket, v := nf)))
               AS mp
      FROM prof GROUP BY {id_col}
    )
    SELECT t.{id_col},
           list_transform(range({int(dim)}),
             i -> COALESCE(map_extract(mp, i)[1], CAST(0 AS BIGINT)))
             AS features
    FROM (SELECT DISTINCT {id_col} FROM {table}) t
    LEFT JOIN m USING ({id_col})
    """
