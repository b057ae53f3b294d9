"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

The timed action is ``count()`` on each query's result, uniformly.
Note the honest caveat: Catalyst prunes subtrees that cannot change the
result cardinality (e.g. the scoring side of a left join against a
per-key aggregate), so for a few left-join-shaped queries
(``lm_perplexity_docs``, ``dsir_weights_docs``) the count measures less
than a full materialization would; their fully-evaluated cousins
(``dsir_sample_docs``, the driver's value-hash run) carry the real cost.

``python bench.py --stress [factors]`` instead measures how the
dedup/CC/ANN family SCALES: the documents/embeddings corpus is
synthetically inflated (replica ids offset, replica words suffixed so
each replica's pair graph is isomorphic to — but disjoint from — the
original's), the operators run at each inflation factor, and the fitted
log-log scaling exponent per family is written to ``STRESS.json``.
Exponent ≈ 1.0 = linear in corpus size; the evidence behind SCALE.md's
100 TB design claims.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _calibrate(spark, sf_dir: str) -> float:
    """Host-contention sentinel: time a FIXED probe — lineitem count +
    a tiny single-column hash agg — whose plan never changes across
    rounds. Its wall time measures the machine, not the engine: on an
    idle host it sits near a stable floor; a contended host inflates it
    by the same factor it inflates every query. Emitted per chunk in
    BENCH_DETAIL (``calib_chunks``) and summarized on the stdout line
    (``calib_sec``), so a contaminated run (r11: driver recorded 245 s
    on a tree that runs at 151 s) is readable off the artifact itself
    — compare calib_sec across rounds before comparing query times.
    Min-of-3 after the warm pass: the sentinel reports the floor the
    host can reach, which is exactly what contention raises."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        li.count()
        li.groupBy("l_returnflag").count().count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


def _time_queries(names: list[str] | None, sf_dir: str) -> dict[str, float]:
    """Warm + min-of-N time the given registry queries (all when None)
    in THIS process's SparkSession. One call = one JVM's worth of
    code-cache/GC history — the forked runner keeps that bounded.
    The returned dict carries one reserved key, ``_calib`` — the host
    sentinel (:func:`_calibrate`) timed in this same JVM."""
    from pybabe_spark.session import get_spark
    from pybabe_spark.queries import all_queries

    spark = get_spark("pybabe_spark-bench")
    spark.sparkContext.setLogLevel("WARN")

    qs = all_queries()
    if names is not None:
        qs = {n: qs[n] for n in names}
    timings: dict[str, float] = {}

    # Warm pass at the smallest SF: triggers whole-stage codegen JIT and
    # file-index setup for every query's code path without touching the
    # timed dataset (standard JVM bench hygiene).
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir):
        for name, fn in qs.items():
            try:
                fn(spark, warm_dir).count()
            except Exception:
                pass

    # Each query is timed as the best of N back-to-back runs: a single
    # shared JVM accumulates code-cache/GC pressure as the suite grows
    # (~120 queries), and one-shot timings charge that churn to whichever
    # query happens to run next — r3's "regressions" on queries with no
    # code changes. Min-of-N (default 3) reports the plan's actual cost; the warm
    # pass above already covered JIT + file-index setup.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings["_calib"] = _calibrate(spark, sf_dir)
    for qi, (name, fn) in enumerate(qs.items()):
        if qi % 20 == 0:
            # shed accumulated session state between query groups: RDD
            # blocks pinned by iterative ops' localCheckpoints and
            # finished-stage shuffle files otherwise pile up across the
            # ~120-query run and tax whoever runs later
            spark.catalog.clearCache()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        best = first = None
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            if first is None:
                first = dt
            best = dt if best is None else min(best, dt)
        # memo-owning keys: later runs hit the session memo, so min-of-N
        # would hide the shared stage's real cost. r13 charged the owner
        # its FIRST timed run, which made PERF read the (shared) memo
        # fill as a per-owner regression whenever siblings' wins landed
        # elsewhere (r13 verdict task #7). r14 accounting: the owner
        # reports its steady state (min-of-N, like every other key) and
        # the fill cost is its OWN additive line, "_memo_fill_<owner>"
        # (first − best, floored at 0) — same suite total, the two
        # components separately visible. The memo-REUSING twin
        # (golden_record) keeps min: reuse IS its steady state.
        timings[name] = round(best, 4)
        if name in _FIRST_RUN_KEYS:
            timings[f"_memo_fill_{name}"] = round(
                max(first - best, 0.0), 4
            )
    spark.stop()
    return timings


#: queries whose first timed run computes a session-memoized stage that
#: every later run (and sibling key) reuses
_FIRST_RUN_KEYS = {
    "entity_resolution_customers",
    "kruskal_wallis_lineitem",
    "jaccard_links_suppliers",
    "dup_clusters_docs",
    "item_neighbors_parts",
}

#: (owner, reuser) pairs that share an in-process memoized stage: the
#: reuser is pulled adjacent to its owner so both land in the same
#: chunk/JVM — split across chunks the sharing never happens
_MEMO_PAIRS = [
    ("entity_resolution_customers", "golden_record_customers"),
    ("kruskal_wallis_lineitem", "dunn_test_lineitem"),
    ("jaccard_links_suppliers", "adamic_adar_suppliers"),
    # 3-gram minhash candidate stage shared three ways (r13)
    ("dup_clusters_docs", "near_dedup_best_docs"),
    ("dup_clusters_docs", "minhash_lsh_shingle3"),
    # support-2 basket pair core shared three ways (r13)
    ("item_neighbors_parts", "association_rules_lineitem"),
    ("item_neighbors_parts", "frequent_pairs_lineitem"),
]


def _run_chunk(out_path: str, names_csv: str) -> None:
    """Child-process entry: time one chunk of queries, dump partial JSON."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    timings = _time_queries(names_csv.split(","), sf_dir)
    with open(out_path, "w") as f:
        json.dump(timings, f)


def _gate_and_write_detail(
    detail: dict, detail_path: str, force: bool = False
) -> bool:
    """Apply the calibration contamination gate, then write (or refuse
    to write) ``detail`` to ``detail_path``. Returns True iff written.

    A run whose ``calib_sec`` exceeds the on-disk round-close calib by
    >25% is tagged ``contaminated: true`` (mutating ``detail`` in
    place, so the stdout line carries the tag to BENCH_r{N}.json) and
    the round-close file is left untouched — the r12 driver run at
    calib 0.1949 silently overwrote a cleaner 0.2017 record; this gate
    is that lesson encoded. A prior file that is itself tagged
    contaminated never serves as the reference floor. ``force``
    overrides the refusal (deliberate re-baseline on a new host)."""
    prior_calib = None
    try:
        with open(detail_path) as f:
            prior = json.load(f)
        if not prior.get("contaminated"):
            prior_calib = prior.get("calib_sec")
    except (OSError, ValueError):
        pass
    calib_sec = detail.get("calib_sec")
    contaminated = (
        prior_calib is not None
        and calib_sec is not None
        and calib_sec > 1.25 * prior_calib
    )
    if contaminated:
        detail["contaminated"] = True
        detail["calib_committed"] = prior_calib
    if force or not contaminated:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
        return True
    # refused runs still leave FULL per-key evidence under a name that
    # cannot be mistaken for the round-close record — a hot-host round
    # otherwise loses every new key's first timing entirely
    with open(detail_path + ".rejected", "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    return False


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pybabe_spark.queries import all_queries

    all_names = list(all_queries())
    # keys that share an in-process memoized stage must land in the SAME
    # chunk/JVM or the sharing never happens: pull each memo-reusing key
    # next to its memo-owning sibling (ER blocking+CC stage, KW rank core)
    for owner, reuser in _MEMO_PAIRS:
        if owner in all_names and reuser in all_names:
            all_names.remove(reuser)
            all_names.insert(all_names.index(owner) + 1, reuser)

    # JVM isolation (r5 bench-integrity finding): the ~120-query suite in
    # ONE shared JVM drifted +13% on unchanged queries across rounds —
    # code-cache/GC pressure, not plan cost. Each chunk of queries now
    # runs in a FRESH child process/JVM (registry import on the parent
    # never starts a JVM), so no query pays for more than chunk_size
    # predecessors' churn. SPARK_GRAFT_BENCH_FORK=0 restores the inline
    # single-JVM path for quick iteration.
    chunk_size = int(os.environ.get("SPARK_GRAFT_BENCH_CHUNK", "24"))
    fork = os.environ.get("SPARK_GRAFT_BENCH_FORK", "1") != "0"
    timings: dict[str, float] = {}
    if fork:
        import subprocess
        import tempfile

        chunks = [
            all_names[lo:lo + chunk_size]
            for lo in range(0, len(all_names), chunk_size)
        ]
        # a memo pair straddling a chunk boundary still loses the
        # sharing — snap the reuser into the owner's chunk
        for owner, reuser in _MEMO_PAIRS:
            for ch in chunks:
                if owner in ch and reuser not in ch:
                    for other in chunks:
                        if reuser in other:
                            other.remove(reuser)
                            ch.insert(ch.index(owner) + 1, reuser)
                            break
        for lo, chunk in enumerate(chunks):
            if not chunk:
                continue
            with tempfile.NamedTemporaryFile(
                suffix=".json", delete=False
            ) as tf:
                out_path = tf.name
            try:
                subprocess.run(
                    [
                        sys.executable,
                        os.path.abspath(__file__),
                        "--chunk",
                        out_path,
                        ",".join(chunk),
                    ],
                    check=True,
                )
                with open(out_path) as f:
                    part = json.load(f)
                # keep every chunk's sentinel distinct across merges
                if "_calib" in part:
                    part[f"_calib_{lo}"] = part.pop("_calib")
                timings.update(part)
            finally:
                if os.path.exists(out_path):
                    os.unlink(out_path)
    else:
        timings = _time_queries(None, sf_dir)
    # peel the reserved per-chunk host sentinels out of the query map:
    # in fork mode every chunk's partial carried "_calib" and update()
    # kept only the last, so chunk runners rename theirs (below) before
    # merging — collect all "_calib*" keys here either way
    calib_chunks = sorted(
        round(timings.pop(k), 4)
        for k in [k for k in timings if k.startswith("_calib")]
    )
    calib_sec = (
        round(calib_chunks[len(calib_chunks) // 2], 4)
        if calib_chunks else None
    )
    total = round(sum(timings.values()), 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    # Full per-query detail goes to a repo file; the stdout line must stay
    # under the driver's 2000-char capture buffer (r1's 2900-char line
    # came back "parsed": null), so the line carries the slowest queries
    # and rolls the rest into "_other".
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # host-contention sentinel: median / per-chunk fixed-probe
        # times (see _calibrate). Idle-host floor ≈ the committed
        # BENCH_DETAIL's values; a round whose calib_sec is 1.5× that
        # floor ran on a contended host and its query times inflate by
        # roughly the same factor — read this before reading "queries".
        "calib_sec": calib_sec,
        "calib_chunks": calib_chunks,
    }
    # Contamination GATE (r12 verdict task #6): the sentinel used to be
    # report-only, and a contended driver run (calib 0.1949) silently
    # overwrote the round-close BENCH_DETAIL recorded at calib 0.2017.
    # Now a run whose sentinel exceeds the committed round-close calib
    # by >25% is tagged "contaminated": true on its stdout line AND
    # refuses to overwrite BENCH_DETAIL.json — the inflated numbers
    # still reach the driver's BENCH_r{N}.json (with the tag), but the
    # repo's round-close record keeps the cleaner host's timings.
    # SPARK_GRAFT_BENCH_FORCE=1 overrides (e.g. a deliberate re-baseline
    # on a new host).
    detail_path = os.path.join(_REPO, "BENCH_DETAIL.json")
    force = os.environ.get("SPARK_GRAFT_BENCH_FORCE", "0") == "1"
    _gate_and_write_detail(detail, detail_path, force=force)

    budget = 1800
    ranked = sorted(timings.items(), key=lambda kv: kv[1], reverse=True)
    line_queries: dict[str, float] = {}
    for name, t in ranked:
        trial = dict(line_queries)
        trial[name] = t
        trial["_other"] = 0.0
        probe = dict(detail, queries=trial)
        if len(json.dumps(probe, separators=(",", ":"))) > budget:
            break
        line_queries[name] = t
    rest = [t for n, t in timings.items() if n not in line_queries]
    if rest:
        line_queries["_other"] = round(sum(rest), 4)
    print(json.dumps(dict(detail, queries=line_queries), separators=(",", ":")))


def _inflate(spark, base_dir: str, factor: int, out_dir: str) -> str:
    """Write a ``factor``-times documents+embeddings corpus under
    ``out_dir``. Replica i's doc ids are offset by i*(max_id+1) and every
    word gets an ``_i`` suffix — so replicas are mutually DISSIMILAR and
    the inflated near-dup pair graph is exactly ``factor`` disjoint
    copies of the original's (same shape, bigger n — what a scaling
    measurement needs). Embeddings keep their vectors (bucket/cell sizes
    grow uniformly ×factor)."""
    from pyspark.sql import functions as F

    if factor == 1:
        return base_dir
    sf_dir = os.path.join(out_dir, f"x{factor}")
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    max_id = docs.agg(F.max("doc_id")).head()[0] + 1
    parts = [docs]
    for i in range(1, factor):
        suffix = F.lit(f"_{i}")
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * max_id))
            .withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split("text", " "), lambda w: F.concat(w, suffix)
                    ),
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(base_dir, "embeddings.parquet"))
    max_vid = emb.agg(F.max("vec_id")).head()[0] + 1
    eparts = [emb]
    for i in range(1, factor):
        eparts.append(emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * max_vid)))
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionByName(p)
    eout.write.mode("overwrite").parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return sf_dir


def _stage_metrics(spark) -> dict[str, int] | None:
    """Cumulative shuffle-write / spill bytes across every stage in the
    app status store (UI-independent); deltas bracketing a run yield
    that run's totals. The wall-time exponents alone can hide a memory
    cliff that 100 TB hits first — spill bytes are the early warning."""
    sc = spark.sparkContext
    try:
        store = sc._jsc.sc().statusStore()
        empty = sc._jvm.java.util.ArrayList()
        arr = sc._gateway.new_array(sc._jvm.double, 0)
        stages = store.stageList(empty, False, False, arr, empty)
        sw = ms = ds = 0
        it = stages.iterator()
        while it.hasNext():
            s = it.next()
            sw += s.shuffleWriteBytes()
            ms += s.memoryBytesSpilled()
            ds += s.diskBytesSpilled()
        return {"shuffle_write": sw, "mem_spill": ms, "disk_spill": ds}
    except Exception:
        return None  # Connect / API drift: skip bytes, keep wall times


#: the families --stress-lowmem squeezes (the ×10 wall-clock top five):
#: wall-time exponents alone can't show whether these SPILL gracefully
#: or OOM when executor memory is the binding constraint — the cliff
#: 100 TB hits first.
LOWMEM_FAMILIES = [
    "near_dedup_best",
    "semantic_dedup",
    "containment_capped",
    "entity_resolution",
    "quality_classifier",
    # r9's two new top-5 bench costs (verdict ask): both are
    # decimal-moment aggregations over de-globalized rank/resample
    # stages — the claim under test is the same graceful-spill one
    "spearman_exact",
    "bootstrap_ci",
    # r10 second-session heavyweights (r10 verdict ask #7): the same
    # de-globalized rank machinery (KW) and the capped-center wedge
    # join (AA) must spill, not OOM, when the unified region shrinks
    "kruskal_wallis",
    "adamic_adar",
    # r11 ops with new aggregation shapes (r11 verdict ask #5): rank
    # pair join, observed-cell G finish, multiplicative ratio windows,
    # beta-binomial moment broadcast — all must spill, not OOM
    "dunn_test",
    "g_test",
    "roc_auc",
    "gains_table",
    "seasonal_decompose_mult",
    "eb_shrinkage",
    # r12 ops with new aggregation shapes: the guarded cells²
    # concordance join and the ≤k-row block-rank windows
    "kendall_tau",
    "friedman",
    # r13 (r12 verdict ask #5): the r12 heavy shapes not yet squeezed —
    # bucket RANGE windows, degree-moment joins, degree-riding wedge agg
    "bollinger",
    "assortativity",
    "jaccard_links",
]


def stress(
    factors: list[int],
    lowmem: bool = False,
    only: list[str] | None = None,
) -> None:
    import tempfile

    import numpy as np

    from pybabe_spark.session import get_spark

    import atexit
    import shutil

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # stage-metric retention raised far above the suite's stage count so
    # the status store never evicts a stage mid-measurement (the UI
    # itself stays off; AppStatusListener records metrics regardless)
    conf = {
        "spark.ui.retainedStages": "100000",
        "spark.ui.retainedJobs": "100000",
    }
    if lowmem:
        # a deliberately memory-starved JVM: 2g heap with the unified
        # execution+storage region cut to 15% (~250 MB) forces the
        # heavy families onto the spill path the normal run never
        # exercises (STRESS.json shows zero spill at ×10 otherwise).
        # The claim under test is GRACEFUL DEGRADATION: slower is fine,
        # OOM is a failure.
        conf["spark.driver.memory"] = os.environ.get(
            "SPARK_GRAFT_LOWMEM_DRIVER_MEM", "2g"
        )
        conf["spark.memory.fraction"] = "0.15"
    spark = get_spark(
        "pybabe_spark-stress-lowmem" if lowmem else "pybabe_spark-stress",
        extra_conf=conf,
    )
    spark.sparkContext.setLogLevel("WARN")
    # the workdir holds sum-of-factors corpus copies (~14x at [1,3,10]) —
    # reclaim at exit rather than orphaning gigabytes per run
    work = tempfile.mkdtemp(prefix="pybabe_stress_")
    atexit.register(shutil.rmtree, work, True)

    from pyspark.sql import functions as F

    from pybabe_spark.functions.text import quality_score
    from pybabe_spark.operators.dedup_scale import (
        minhash_lsh_pairs,
        near_dedup_against,
        near_dedup_keep,
    )
    from pybabe_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
    )
    from pybabe_spark.operators.anomaly import mad_anomalies
    from pybabe_spark.operators.decontam import strip_duplicated_spans
    from pybabe_spark.operators.dedup_scale import containment_pairs
    from pybabe_spark.operators.dsir import doc_feature_profile
    from pybabe_spark.operators.nb import nb_predict, train_naive_bayes
    from pybabe_spark.operators.recommend import item_neighbors
    from pybabe_spark.operators.timeseries import acf

    def _clf_run(docs):
        # one materialized profile shared by train + score — the
        # operator's own train/score-online shape; without it the
        # timing double-charges the md5 feature explode
        labeled = docs.withColumn(
            "__lbl", (F.col("lang") == "en").cast("int")
        )
        prof = doc_feature_profile(labeled, buckets=4096).localCheckpoint(
            eager=True
        )
        w = train_quality_classifier(
            labeled, "__lbl", iters=2, lr=1.0, profile=prof
        )
        return (
            score_quality(labeled, w, profile=prof)
            .filter(F.col("prob").isNotNull())
            .count()
        )
    from pybabe_spark.operators.dsir import dsir_log_weights, dsir_resample
    from pybabe_spark.operators.graph import dup_clusters
    from pybabe_spark.operators.lm import perplexity, train_bigram_lm
    from pybabe_spark.operators.similarity import (
        ann_lsh_stored,
        ann_pq,
        build_lsh_index,
        pq_encode,
        semantic_dedup,
    )

    from pybabe_spark.operators.graph import pagerank
    from pybabe_spark.operators.tfidf import (
        bm25_search_stored,
        build_bm25_index,
    )

    def _families(sf_dir, factor=1):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        scored = docs.select(
            "doc_id", "text", quality_score("text").alias("score")
        )
        idx = os.path.join(work, "lsh_idx", os.path.basename(sf_dir) or "base")
        bm25_idx = os.path.join(
            work, "bm25_idx", os.path.basename(sf_dir) or "base"
        )
        queries = emb.filter(F.col("vec_id") < 5)

        def _ann_build():
            build_lsh_index(emb, idx, dims=64, planes=4)

        def _ann_probe():
            ann_lsh_stored(
                spark, idx, queries, k=10, dims=64, planes=4, nprobe=2
            ).count()

        def _bm25_build():
            build_bm25_index(docs, bm25_idx)

        def _bm25_probe():
            # original-corpus terms: replica tokens carry _i suffixes, so
            # the probed posting lists stay x1-sized while the index
            # grows — the stored-index claim is that probe cost tracks
            # the posting lists + 3/256 bucket partitions, not the corpus
            bm25_search_stored(
                spark, bm25_idx, ["spark", "window", "sort"], k=10
            ).count()

        def _pagerank_chain():
            # doc-id chain (replica offsets keep ids unique): |E| grows
            # with the corpus, graph is segment-shaped, 3 iterations
            e = docs.select(
                F.col("doc_id").alias("src"),
                (F.col("doc_id") + 1).alias("dst"),
            )
            edges = e.unionAll(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            pagerank(edges, iters=3).count()

        def _carved_events():
            # synthetic event log carved from the inflated corpus:
            # users ∝ factor (per-key series length stays flat, the
            # realistic growth mode), fixed 30-day span
            return docs.select(
                (F.col("doc_id") % F.lit(150 * factor)).alias("user_id"),
                F.timestamp_seconds(
                    (F.col("doc_id") * 37 % 2592000).cast("long")
                ).alias("ts"),
                F.col("doc_id").alias("event_id"),
                (F.col("doc_id") % 100).cast("double").alias("value"),
                F.col("source").alias("attr"),
            )

        def _attribution():
            # conversions ≈ 5% of events, touches the rest; credit per
            # conversion is window-bounded by per-user activity (flat)
            from pybabe_spark.operators.attribution import (
                attribute_conversions,
            )

            ev = _carved_events()
            attribute_conversions(
                ev,
                conversion=F.col("value") >= 95,
                touch=F.col("value") < 95,
                channel_col="attr",
                model="linear",
                lookback_days=7,
            ).count()

        def _entity_resolution():
            # names ∝ corpus; digit-edit candidate graph grows linearly,
            # CC diameter stays flat — the r7 composition at scale
            from pybabe_spark.operators.fuzzy import fuzzy_pairs

            named = docs.select(
                F.col("doc_id"),
                F.concat(
                    F.lit("Name#"),
                    F.lpad(F.col("doc_id").cast("string"), 9, "0"),
                ).alias("name"),
            )
            pairs = fuzzy_pairs(named, "doc_id", "name", max_dist=1)
            dup_clusters(
                named, pairs, id_col="doc_id", src="id1", dst="id2"
            ).count()

        def _scd2_upsert():
            # changelog keys ∝ factor; append batch = newest third of
            # ids — incremental cost must track the batch's keys
            from pybabe_spark.operators.scd import (
                scd2_from_changelog,
                scd2_upsert,
            )

            log = docs.select(
                (F.col("doc_id") % F.lit(150 * factor)).alias("k"),
                F.col("doc_id").alias("ts"),
                F.col("source").alias("attr"),
            )
            cut = log.agg(
                (F.max("ts") * 2 / 3).cast("long").alias("c")
            ).collect()[0]["c"]
            hist = scd2_from_changelog(
                log.filter(F.col("ts") < cut), "k", "ts", ["attr"]
            )
            scd2_upsert(
                hist, log.filter(F.col("ts") >= cut), "k", "ts", ["attr"]
            ).count()

        def _retention():
            from pybabe_spark.operators.timeseries import retention_cohorts

            retention_cohorts(
                _carved_events(), "user_id", "ts", 86400, 10
            ).count()

        def _sessionize_gap_fill():
            # synthetic event log carved from the inflated corpus:
            # users ∝ factor (per-key series length stays flat, the
            # realistic growth mode), fixed 30-day span → the gap-fill
            # grid grows with users, i.e. linearly
            from pybabe_spark.operators.timeseries import (
                gap_fill,
                session_stats,
            )

            ev = docs.select(
                (F.col("doc_id") % F.lit(150 * factor)).alias("user_id"),
                F.timestamp_seconds(
                    (F.col("doc_id") * 37 % 2592000).cast("long")
                ).alias("ts"),
                F.col("doc_id").alias("event_id"),
                (F.col("doc_id") % 100).cast("double").alias("value"),
            )
            session_stats(ev, 3600, order_cols=["event_id"]).count()
            gap_fill(ev, 86400, "user_id", "ts", {"value": "sum"}).count()

        def _spatial_radius():
            from pybabe_spark.operators.spatial import radius_join

            def coord(tag, mod):
                return (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(tag),
                                    F.col("doc_id").cast("string"),
                                )
                            ),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("bigint")
                    % mod
                ).cast("double")

            left = docs.filter(F.col("doc_id") % 2 == 0).select(
                F.col("doc_id").alias("lid"),
                coord("x", 10000 * factor).alias("lx"),
                coord("y", 10000).alias("ly"),
            )
            right = docs.filter(F.col("doc_id") % 2 == 1).select(
                F.col("doc_id").alias("rid"),
                coord("x", 10000 * factor).alias("rx"),
                coord("y", 10000).alias("ry"),
            )
            radius_join(
                left, right, 300.0, ("lx", "ly"), ("rx", "ry")
            ).count()

        def _label_prop_chain():
            from pybabe_spark.operators.graph import propagate_labels

            e = docs.select(
                F.col("doc_id").alias("id_a"),
                (F.col("doc_id") + 1).alias("id_b"),
            )
            seeds = docs.filter(F.col("doc_id") % 100 == 0).select(
                F.col("doc_id").alias("s"),
                (F.col("doc_id") % 7).alias("label"),
            )
            propagate_labels(e, seeds, max_hops=3).count()

        def _cdc_apply():
            from pybabe_spark.operators.cdc import apply_cdc
            from pyspark.sql import Window

            log = docs.select(
                (F.col("doc_id") % F.lit(150 * factor)).alias("k"),
                F.col("doc_id").alias("ts"),
                F.col("source").alias("v"),
            )
            cut = log.agg(
                (F.max("ts") * 2 / 3).cast("long").alias("c")
            ).collect()[0]["c"]
            w = Window.partitionBy("k").orderBy(F.col("ts").desc())
            base = (
                log.filter(F.col("ts") < cut)
                .withColumn("__rn", F.row_number().over(w))
                .filter("__rn = 1")
                .select("k", "v")
            )
            feed = log.filter(F.col("ts") >= cut).select(
                "k",
                "ts",
                "v",
                F.when(F.col("ts") % 7 == 0, F.lit("D"))
                .otherwise(F.lit("U"))
                .alias("op"),
            )
            apply_cdc(base, feed, "k", "ts").count()

        def _sssp_chain():
            from pybabe_spark.operators.graph import sssp

            # chain graph with corpus-proportional length; 4 hops ->
            # frontier work linear in edges touched, never the graph^2
            e = docs.select(
                F.col("doc_id").alias("src"),
                (F.col("doc_id") + 1).alias("dst"),
                (F.col("doc_id") % 100 / 10.0 + 0.1).alias("w"),
            )
            srcs = docs.filter(F.col("doc_id") % 100 == 0).select(
                F.col("doc_id").alias("s")
            )
            sssp(e, srcs, max_hops=4).count()

        def _kcore_ring():
            from pybabe_spark.operators.graph import k_core

            # ring + chords: every node degree 4 -> 3-core keeps all,
            # peeling converges in one confirm round; per-round cost
            # must track |E| (linear)
            n_docs_expr = docs.agg(F.max("doc_id")).collect()[0][0] + 1
            ring = docs.select(
                F.col("doc_id").alias("id_a"),
                ((F.col("doc_id") + 1) % n_docs_expr).alias("id_b"),
            )
            chords = docs.select(
                F.col("doc_id").alias("id_a"),
                ((F.col("doc_id") + 2) % n_docs_expr).alias("id_b"),
            )
            k_core(ring.unionByName(chords), k=3, max_rounds=4).count()

        def _theilsen_daily():
            from pybabe_spark.operators.timeseries import theilsen_slope

            # keys ∝ factor, ~30 daily points per key (flat) -> the
            # O(points²) pair join is constant per key, linear overall
            ev = _carved_events()
            daily = ev.groupBy(
                "user_id", F.col("ts").cast("date").alias("day")
            ).agg(
                (F.sum(
                    (F.col("value").cast("decimal(18,2)") * 100)
                    .cast("bigint")
                ).cast("decimal(18,2)") / 100).alias("v")
            ).select(
                "user_id",
                F.col("day").cast("timestamp").alias("day"),
                "v",
            )
            theilsen_slope(daily, "user_id", "day", "v").count()

        def _ranking_eval():
            from pyspark.sql import Window

            from pybabe_spark.operators.ranking import (
                ranking_metrics,
                rbo_overlap,
            )

            w = Window.partitionBy("lang").orderBy(
                F.col("n_chars").desc(), F.col("doc_id").asc()
            )
            ranked = docs.select(
                "lang", "doc_id", F.row_number().over(w).alias("rank")
            ).filter(F.col("rank") <= 10)
            truth = docs.filter(F.col("doc_id") % 3 == 0).select(
                "lang", "doc_id"
            )
            ranking_metrics(
                ranked, truth, "lang", "doc_id", "rank", 10
            ).count()
            rbo_overlap(
                ranked, ranked, "lang", "doc_id", "rank", 10
            ).count()

        return {
            "entity_resolution": _entity_resolution,
            "scd2_upsert": _scd2_upsert,
            "retention_cohorts": _retention,
            "sessionize_gap_fill": _sessionize_gap_fill,
            "bm25_index_build": _bm25_build,
            "bm25_stored_probe": _bm25_probe,
            "pagerank_chain": _pagerank_chain,
            "minhash_lsh_pairs": lambda: minhash_lsh_pairs(
                docs, "doc_id", "text", num_hashes=16, bands=4, shingle_n=3
            ).count(),
            "dup_clusters": lambda: dup_clusters(
                docs,
                minhash_lsh_pairs(
                    docs, "doc_id", "text", num_hashes=16, bands=4, shingle_n=3
                ),
            ).count(),
            "near_dedup_best": lambda: near_dedup_keep(
                scored,
                "doc_id",
                "text",
                threshold=0.5,
                shingle_n=3,
                use_lsh_candidates=True,
                policy="best",
                score_col="score",
            ).count(),
            "near_dedup_against": lambda: near_dedup_against(
                docs.filter(F.col("doc_id") % 5 != 0),
                docs.filter(F.col("doc_id") % 5 == 0),
                "doc_id",
                "text",
                threshold=0.5,
                shingle_n=3,
                use_lsh_candidates=True,
            ).count(),
            "ann_lsh_build": _ann_build,
            "ann_lsh_stored_probe": _ann_probe,
            # cluster count scales with the corpus (the SemDeDup design
            # point: fixed expected cell membership bounds the in-cell
            # quadratic) — k ∝ factor keeps per-cell size flat
            "semantic_dedup": lambda: semantic_dedup(
                emb, k_clusters=8 * factor, threshold=0.4
            ).filter("NOT kept").count(),
            "pq_encode": lambda: pq_encode(emb).count(),
            "ann_pq": lambda: ann_pq(emb, queries, k=10).count(),
            # count() would prune the left-join scoring subtrees of the
            # LM/DSIR outputs (bench.py module docstring) — force full
            # evaluation through the non-null filter so the measured
            # time is the whole train+score pipeline
            "lm_perplexity": lambda: perplexity(docs, train_bigram_lm(docs))
            .filter(F.col("ppl").isNotNull())
            .count(),
            "dsir_select": lambda: dsir_resample(
                dsir_log_weights(docs, docs.filter(F.col("lang") == "en")),
                50,
            ).count(),
            "strip_dup_spans": lambda: strip_duplicated_spans(docs, n=6)
            .filter(F.col("n_removed") > 0)
            .count(),
            # corpus-frequency line dedup: the replica suffixing keeps
            # each replica's lines distinct, so the boilerplate table
            # (shared banner lines injected here) stays x1-sized while
            # the exploded line count grows with the corpus
            "strip_boilerplate": lambda: __import__(
                "pybabe_spark.operators.decontam",
                fromlist=["strip_boilerplate_lines"],
            ).strip_boilerplate_lines(
                docs.select(
                    "doc_id",
                    F.concat(
                        F.lit("COOKIE BANNER\n"), F.col("text"),
                        F.lit("\nfooter-"),
                        (F.col("doc_id") % 3).cast("string"),
                    ).alias("text"),
                ),
                "doc_id", "text", min_df=2,
            ).count(),
            # per-language greedy budget fill: one keyed cumsum window;
            # budget ∝ factor keeps the kept fraction comparable
            "token_budget": lambda: __import__(
                "pybabe_spark.operators.sampling",
                fromlist=["token_budget_sample"],
            ).token_budget_sample(
                docs, "lang", "doc_id", "n_chars", 10_000 * factor
            ).count(),
            "quality_classifier": lambda: _clf_run(docs),
            "attribution_linear": _attribution,
            # hot-shingle valve demo: the synthetic 31-word vocab makes
            # 3-gram shingles near-complete across docs — without the
            # df cap the inverted join is Θ(n²); with it, candidate
            # volume is n_shingles · cap² (linear in the corpus)
            "containment_capped": lambda: containment_pairs(
                docs, "doc_id", "text", threshold=0.5, shingle_n=3,
                max_shingle_df=20,
            ).count(),
            # per-key exact medians at scale: users ∝ factor, per-key
            # series flat — grouped percentile cost must track keys
            "mad_anomalies": lambda: mad_anomalies(
                _carved_events(), "user_id", "value", "ts", threshold=2.0
            ).count(),
            # r8 families ------------------------------------------------
            # area ∝ factor with flat density → true pairs ∝ factor;
            # the grid join's candidate volume must track that, not n²
            "spatial_radius": _spatial_radius,
            # baskets ∝ corpus, width flat, vocab ∝ factor → pair table
            # ∝ corpus; top-k window input is the pruned pair table
            "item_neighbors": lambda: item_neighbors(
                docs.select(
                    (F.col("doc_id") / 5).cast("bigint").alias("b"),
                    (F.col("doc_id") % (200 * factor)).alias("i"),
                ),
                "b",
                "i",
                k=5,
                min_support=2,
            ).count(),
            # chain graph ∝ corpus, seeds every 100 ids → frontier work
            # linear per hop, 3 hops
            "label_propagation": _label_prop_chain,
            # count-train + coverage-identity scoring: two aggs + one
            # model join, everything ∝ corpus
            "naive_bayes": lambda: nb_predict(
                docs.filter(F.col("doc_id") % 2 == 1),
                train_naive_bayes(
                    docs.filter(F.col("doc_id") % 2 == 0), "lang"
                ),
            ).count(),
            # keys ∝ factor; feed = newest third — apply cost must
            # track the feed + one base anti-join, never re-window base
            "cdc_apply": _cdc_apply,
            # one lag window + one agg over users ∝ factor
            "acf_lags": lambda: acf(
                _carved_events(), "user_id", "ts", "value", lags=3
            ).count(),
            # r8 second-session families --------------------------------
            "sssp_chain": _sssp_chain,
            "kcore_ring": _kcore_ring,
            "theilsen_daily": _theilsen_daily,
            # r10 families: the two new r9 top-5 bench costs ------------
            # rows ∝ corpus, distinct (x, y) values bounded (mod carve)
            # → rank tables flat, the corpus-side rank join + one
            # DECIMAL(38,0) moment agg must track rows linearly
            "spearman_exact": lambda: __import__(
                "pybabe_spark.operators.sketch",
                fromlist=["spearman_corr"],
            ).spearman_corr(
                docs.select(
                    F.col("lang"),
                    (F.col("doc_id") % 100).cast("double").alias("x"),
                    ((F.col("doc_id") * 37) % 89).cast("double").alias("y"),
                ),
                "x", "y", by="lang",
            ).count(),
            # ONE fixed-width agg of 2B+2 sums over md5 Poisson weights
            # (B = 50 constant): cost must track rows, memory flat
            "bootstrap_ci": lambda: __import__(
                "pybabe_spark.operators.sketch",
                fromlist=["bootstrap_mean_ci"],
            ).bootstrap_mean_ci(
                docs.select(
                    F.col("lang"),
                    F.col("doc_id").alias("k"),
                    (F.col("doc_id") % 100).cast("double").alias("v"),
                ),
                "v", "k", by="lang",
            ).count(),
            # r10 families ----------------------------------------------
            # bounded value domain (mod carve) → distinct-value/cell
            # tables flat; cost must track rows through the one hash agg
            "ks_two_sample": lambda: __import__(
                "pybabe_spark.operators.sketch", fromlist=["ks_test"]
            ).ks_test(
                docs.select(
                    F.when(F.col("doc_id") % 2 == 0, F.lit("a"))
                    .otherwise(F.lit("b")).alias("g"),
                    (F.col("doc_id") % 97).cast("double").alias("v"),
                ),
                "g", "v", "a", "b",
            ).count(),
            # groups (lang) and values (source) stay flat while rows grow
            # → MG candidate table flat, confirm join ∝ rows
            "group_heavy_hitters": lambda: __import__(
                "pybabe_spark.operators.sketch",
                fromlist=["group_heavy_hitters"],
            ).group_heavy_hitters(docs, "lang", "source", 0.01).count(),
            # replica words are suffixed (mutually dissimilar) → the
            # near-dup pair graph is factor disjoint copies; signature
            # pass ∝ token rows, banded join ∝ corpus × bands
            "simhash_neardup": lambda: __import__(
                "pybabe_spark.operators.dedup_scale",
                fromlist=["simhash_neardup_pairs"],
            ).simhash_neardup_pairs(
                docs, "doc_id", "text", bits=32, max_hamming=3
            ).count(),
            # per-lang rankings over a growing corpus + the rank<=10
            # metric joins: the window sorts dominate, n log n per lang
            "ranking_eval": _ranking_eval,
            # r10 second-session families --------------------------------
            # bounded value domain (mod carve) → distinct-value/cell and
            # rank tables flat; the (value, group) agg + rank join back
            # must track rows linearly
            "kruskal_wallis": lambda: __import__(
                "pybabe_spark.operators.sketch",
                fromlist=["kruskal_wallis"],
            ).kruskal_wallis(
                docs.select(
                    F.col("lang").alias("g"),
                    (F.col("doc_id") % 97).cast("double").alias("v"),
                ),
                "g", "v",
            ).count(),
            # doc-id chain + skip edges (replica offsets keep replicas
            # disjoint): degree ≤ 4 flat, wedge volume ∝ nodes — the
            # capped-center contract's linear regime
            "adamic_adar": lambda: __import__(
                "pybabe_spark.operators.graph",
                fromlist=["adamic_adar"],
            ).adamic_adar(
                docs.select(
                    F.col("doc_id").alias("id_a"),
                    (F.col("doc_id") + 1).alias("id_b"),
                ).unionAll(
                    docs.select(
                        F.col("doc_id").alias("id_a"),
                        (F.col("doc_id") + 2).alias("id_b"),
                    )
                ),
                top_n=100,
            ).count(),
            # r11 families ----------------------------------------------
            # narrow map, zero shuffle: cost must track rows exactly
            "readability": lambda: docs.select(
                __import__(
                    "pybabe_spark.functions.text", fromlist=["readability"]
                ).readability("text").alias("r")
            ).count(),
            # replica words are suffixed → vocab grows ×factor while the
            # 10 sources stay flat: cost must track VOCAB (the distinct
            # (source, word) grain), pairs stay 45
            "vocab_overlap": lambda: __import__(
                "pybabe_spark.operators.tfidf", fromlist=["vocab_overlap"]
            ).vocab_overlap(docs, "source", "text").count(),
            # one corpus hash agg to the bounded micro-score grain; the
            # cumulative window is resolution-bounded, not corpus-bound
            "roc_auc": lambda: __import__(
                "pybabe_spark.operators.classifier", fromlist=["roc_auc"]
            ).roc_auc(
                docs.select(
                    (
                        F.least(
                            F.size(F.split("text", " ")) * 5000,
                            F.lit(1_000_000),
                        ).cast("decimal(18,6)") / 1_000_000
                    ).alias("score"),
                    (F.col("doc_id") % 3 == 0).cast("int").alias("label"),
                ),
                "score", "label",
            ).count(),
            # de-globalized ranks: tie cells are per-(score) partitions;
            # work ∝ rows through the grain join + row_number
            "gains_table": lambda: __import__(
                "pybabe_spark.operators.classifier",
                fromlist=["gains_table"],
            ).gains_table(
                docs.select(
                    "doc_id",
                    (
                        F.least(
                            F.size(F.split("text", " ")) * 5000,
                            F.lit(1_000_000),
                        ).cast("decimal(18,6)") / 1_000_000
                    ).alias("score"),
                    (F.col("doc_id") % 3 == 0).cast("int").alias("label"),
                ),
                "score", "label", "doc_id",
            ).count(),
            # exploded (label, pos) grain ∝ corpus × dims feeding two
            # hash aggs; the cosine stage is labels × dims — flat
            "centroid_drift": lambda: __import__(
                "pybabe_spark.operators.similarity",
                fromlist=["centroid_drift"],
            ).centroid_drift(emb, "label", "embedding").count(),
            # bucket table grows ∝ corpus (t = doc_id div 10): the
            # range windows and slot aggs must track buckets linearly
            "seasonal_decompose": lambda: __import__(
                "pybabe_spark.operators.timeseries",
                fromlist=["seasonal_decompose"],
            ).seasonal_decompose(
                docs.select(
                    F.col("source").alias("k"),
                    F.timestamp_micros(
                        (F.col("doc_id").cast("bigint") / 10).cast("bigint")
                        * 3_600_000_000
                    ).alias("ts"),
                    F.col("n_chars").cast("double").alias("v"),
                ),
                "k", "ts", "v", period=24,
            ).count(),
            # r12 families (r11 verdict ask #5): the round's new
            # aggregation shapes under the same scaling contract ------
            # shares the KW rank core's plan; the pair join is k² on
            # the tiny per-group table — cost must track rows
            "dunn_test": lambda: __import__(
                "pybabe_spark.operators.sketch", fromlist=["dunn_test"]
            ).dunn_test(
                docs.select(
                    F.col("lang").alias("g"),
                    (F.col("doc_id") % 97).cast("double").alias("v"),
                ),
                "g", "v",
            ).count(),
            # observed-cell table bounded (langs × sources flat) → one
            # corpus hash agg dominates, finish is cell-sized
            "g_test": lambda: __import__(
                "pybabe_spark.operators.sketch", fromlist=["g_test"]
            ).g_test(docs, "lang", "source").count(),
            # bucket grain bounded (5000 hours × sources) while rows
            # grow → the bucket agg ∝ rows, windows/slots flat
            "seasonal_decompose_mult": lambda: __import__(
                "pybabe_spark.operators.timeseries",
                fromlist=["seasonal_decompose_mult"],
            ).seasonal_decompose_mult(
                docs.select(
                    F.col("source").alias("k"),
                    F.timestamp_micros(
                        (F.col("doc_id") % 5000).cast("bigint")
                        * 3_600_000_000
                    ).alias("ts"),
                    (F.col("doc_id") % 50 + 1).cast("double").alias("v"),
                ),
                "k", "ts", "v", period=24,
            ).count(),
            # bounded bucket domain (200) → group table flat, one
            # map-combinable corpus agg + a broadcast moments row
            "eb_shrinkage": lambda: __import__(
                "pybabe_spark.operators.sketch",
                fromlist=["eb_shrink_rates"],
            ).eb_shrink_rates(
                docs.select(
                    (F.col("doc_id") % 200).alias("bucket"),
                    (F.col("doc_id") % 3 == 0).cast("int").alias("done"),
                ),
                "bucket", "done",
            ).count(),
            # r12 second-session families --------------------------------
            # bounded 50×11 cell grid (mod carve) → the guarded cells²
            # concordance join is FLAT; corpus work is the one hash agg
            "kendall_tau": lambda: __import__(
                "pybabe_spark.operators.sketch",
                fromlist=["kendall_tau_b"],
            ).kendall_tau_b(
                docs.select(
                    (F.col("doc_id") % 50).cast("double").alias("x"),
                    ((F.col("doc_id") * 3) % 11).cast("double").alias("y"),
                ),
                "x", "y",
            ).count(),
            # blocks ∝ corpus (doc_id div 5), k = 5 treatments: cell
            # grain and ≤5-row block windows must track rows linearly
            # (page_trend_test and cochran_q ride the identical
            # _block_grid/_block_midranks plumbing)
            "friedman": lambda: __import__(
                "pybabe_spark.operators.sketch",
                fromlist=["friedman_test"],
            ).friedman_test(
                docs.select(
                    (F.col("doc_id") / 5).cast("bigint").alias("b"),
                    (F.col("doc_id") % 5).alias("t"),
                    F.col("n_chars").cast("double").alias("v"),
                ),
                "b", "t", "v",
            ).count(),
            # buckets ∝ corpus (t = doc_id div 10), 24-bucket trailing
            # RANGE windows on the bucket grain — both linear
            "bollinger": lambda: __import__(
                "pybabe_spark.operators.timeseries",
                fromlist=["bollinger_bands"],
            ).bollinger_bands(
                docs.select(
                    F.col("source").alias("k"),
                    F.timestamp_micros(
                        (F.col("doc_id").cast("bigint") / 10).cast("bigint")
                        * 3_600_000_000
                    ).alias("ts"),
                    F.col("n_chars").cast("double").alias("v"),
                ),
                "k", "ts", "v", window=24,
            ).count(),
            # degree moments over the doc-chain edges (degree ≤ 4 flat):
            # one degree agg + two tiny-table joins, linear in edges
            "assortativity": lambda: __import__(
                "pybabe_spark.operators.graph",
                fromlist=["assortativity"],
            ).assortativity(
                docs.select(
                    F.col("doc_id").alias("id_a"),
                    (F.col("doc_id") + 1).alias("id_b"),
                ).unionAll(
                    docs.select(
                        F.col("doc_id").alias("id_a"),
                        (F.col("doc_id") + 2).alias("id_b"),
                    )
                ),
            ).count(),
            # r13: same chain+skip edges as adamic_adar (degree ≤ 4
            # flat) through the degree-riding wedge agg — wedge volume
            # ∝ nodes, the capped-center linear regime
            "jaccard_links": lambda: __import__(
                "pybabe_spark.operators.graph",
                fromlist=["jaccard_link_prediction"],
            ).jaccard_link_prediction(
                docs.select(
                    F.col("doc_id").alias("id_a"),
                    (F.col("doc_id") + 1).alias("id_b"),
                ).unionAll(
                    docs.select(
                        F.col("doc_id").alias("id_a"),
                        (F.col("doc_id") + 2).alias("id_b"),
                    )
                ),
                top_n=100,
            ).count(),
            # r13 batch-2 families ---------------------------------------
            # gram explode ∝ corpus words (the only corpus-heavy map of
            # the batch), doc-partitioned double window, per-doc agg —
            # must track words linearly like tokenize
            "winnow": lambda: __import__(
                "pybabe_spark.operators.dedup_scale",
                fromlist=["winnow_fingerprints"],
            ).winnow_fingerprints(docs, "doc_id", "text", k=4, w=5)
            .count(),
            # two map-combinable corpus aggs + a broadcast moments join;
            # groups flat (lang) → everything ∝ rows
            "jarque_bera": lambda: __import__(
                "pybabe_spark.operators.sketch",
                fromlist=["jarque_bera"],
            ).jarque_bera(
                docs.select(
                    "lang", F.col("n_chars").cast("double").alias("v")
                ),
                "v", by="lang",
            ).count(),
            # cents grain bounded (n_chars domain flat) → the median
            # reach window is FLAT; corpus work is the two hash aggs
            "mood_median": lambda: __import__(
                "pybabe_spark.operators.sketch",
                fromlist=["mood_median_test"],
            ).mood_median_test(
                docs.select(
                    "lang", F.col("n_chars").cast("double").alias("v")
                ),
                "lang", "v",
            ).count(),
            # two keyless corpus aggs with a 1-row attach between;
            # residual-square map is narrow codegen
            "breusch_pagan": lambda: __import__(
                "pybabe_spark.operators.regression",
                fromlist=["breusch_pagan"],
            ).breusch_pagan(
                docs.select(
                    (F.col("doc_id") % 97).cast("double").alias("x"),
                    F.col("n_chars").cast("double").alias("y"),
                ),
                "x", "y",
            ).count(),
            # bucket grain bounded (200 hourly buckets via doc_id mod
            # carve) → the T² sign join is FLAT; corpus work is the
            # bucket agg
            "pettitt": lambda: __import__(
                "pybabe_spark.operators.timeseries",
                fromlist=["pettitt_test"],
            ).pettitt_test(
                docs.select(
                    F.col("source").alias("k"),
                    F.timestamp_micros(
                        (F.col("doc_id") % 200).cast("bigint")
                        * 3_600_000_000
                    ).alias("ts"),
                    F.col("n_chars").cast("double").alias("v"),
                ),
                "k", "ts", "v", bucket_seconds=3600,
            ).count(),
        }

    # Warm pass: run every family once untimed so JIT/codegen/file-index
    # setup isn't charged to the first factor (it made tiny-scale
    # exponents negative). Timed runs are then best-of-2 per factor.
    for name, fn in _families(base_dir).items():
        fn()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    sizes: dict[int, dict[str, int]] = {}
    timings: dict[str, dict[int, float]] = {}
    bytes_by: dict[str, dict[int, dict[str, int]]] = {}
    for factor in factors:
        sf_dir = _inflate(spark, base_dir, factor, work)
        n_docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).count()
        n_vecs = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")
        ).count()
        sizes[factor] = {"n_docs": n_docs, "n_vecs": n_vecs}
        fams = _families(sf_dir, factor)
        if only is not None:
            fams = {n: fams[n] for n in only if n in fams}
        for name, fn in fams.items():
            # same session-state shedding as main(): checkpoint blocks
            # pinned by the iterative families (CC, greedy dedup, the
            # classifier) must not accumulate across factors and tax
            # later timings — that would skew the fitted exponents
            spark.catalog.clearCache()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            best = None
            for ri in range(runs):
                if ri == 0:
                    m0 = _stage_metrics(spark)
                t0 = time.perf_counter()
                fn()
                dt = time.perf_counter() - t0
                if ri == 0:
                    m1 = _stage_metrics(spark)
                    if m0 is not None and m1 is not None:
                        bytes_by[name] = bytes_by.get(name, {})
                        bytes_by[name][factor] = {
                            k: m1[k] - m0[k] for k in m0
                        }
                best = dt if best is None else min(best, dt)
            timings.setdefault(name, {})[factor] = round(best, 3)
            print(f"  x{factor} {name}: {best:.3f}s", file=sys.stderr)

    exponents = {}
    for name, by_factor in timings.items():
        if len(by_factor) < 2:  # one factor: no line to fit
            exponents[name] = None
            continue
        xs = np.log([f for f in by_factor])
        ys = np.log([max(t, 1e-3) for t in by_factor.values()])
        exponents[name] = round(float(np.polyfit(xs, ys, 1)[0]), 3)

    out = {
        "metric": "stress_scaling",
        "base_sf_dir": base_dir,
        "factors": factors,
        "sizes": sizes,
        "timings_sec": {
            n: {str(f): t for f, t in d.items()} for n, d in timings.items()
        },
        "scaling_exponent": exponents,
        # per-family per-factor shuffle-write + spill bytes of one run
        # (status-store deltas): the memory-pressure axis wall time hides
        "stage_bytes": {
            n: {str(f): m for f, m in d.items()} for n, d in bytes_by.items()
        },
    }
    path = os.path.join(_REPO, "STRESS.json")
    if lowmem:
        # merge as a section of the existing STRESS.json so both axes
        # (scale exponents, memory-pressure behavior) live in one file
        try:
            full = json.load(open(path))
        except (OSError, ValueError):
            full = {}
        # targeted lowmem runs (new families) MERGE into the standing
        # section — clobbering would silently drop the other families'
        # oom=false evidence (the same rule the non-lowmem targeted
        # path has always had)
        prev_lm = full.get("lowmem", {})
        ran = list(only or LOWMEM_FAMILIES)
        fam_union = list(
            dict.fromkeys(list(prev_lm.get("families", [])) + ran)
        )
        merged_t = dict(prev_lm.get("timings_sec", {}))
        merged_t.update(out["timings_sec"])
        merged_b = dict(prev_lm.get("stage_bytes", {}))
        merged_b.update(out["stage_bytes"])
        full["lowmem"] = {
            "driver_memory": conf["spark.driver.memory"],
            "memory_fraction": conf["spark.memory.fraction"],
            "factors": factors,
            "families": fam_union,
            "timings_sec": merged_t,
            "stage_bytes": merged_b,
            "oom": False,  # reaching this line means every family ran
        }
        with open(path, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
        print(json.dumps(full["lowmem"], separators=(",", ":")))
    else:
        try:
            prev = json.load(open(path))
        except (OSError, ValueError):
            prev = {}
        if "lowmem" in prev:
            out["lowmem"] = prev["lowmem"]  # keep the other axis
        if only is not None:
            # a targeted run (new families) MERGES into the standing
            # full-sweep file instead of clobbering the other ~40
            # families' evidence; the per-family factor lists can
            # legitimately differ across runs
            for section in ("timings_sec", "scaling_exponent",
                            "stage_bytes"):
                merged = dict(prev.get(section, {}))
                merged.update(out[section])
                out[section] = merged
            out["sizes"] = {**prev.get("sizes", {}),
                            **{str(k): v for k, v in sizes.items()}}
            out["factors"] = prev.get("factors", factors)
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--stress":
        factors = (
            [int(x) for x in sys.argv[2].split(",")]
            if len(sys.argv) > 2
            else [1, 3, 10]
        )
        stress(factors)
    elif len(sys.argv) > 2 and sys.argv[1] == "--stress-only":
        # targeted exponents for a named family subset (e.g. families
        # added this round) — merges into STRESS.json, never clobbers
        # the standing full-sweep evidence
        fams = sys.argv[2].split(",")
        factors = (
            [int(x) for x in sys.argv[3].split(",")]
            if len(sys.argv) > 3
            else [1, 3, 10]
        )
        stress(factors, only=fams)
    elif len(sys.argv) > 1 and sys.argv[1] == "--stress-lowmem":
        factors = (
            [int(x) for x in sys.argv[2].split(",")]
            if len(sys.argv) > 2
            else [10]
        )
        # optional 3rd arg: comma-separated family subset (a targeted
        # squeeze of newly-added families; merges into the section)
        fams = (
            sys.argv[3].split(",") if len(sys.argv) > 3
            else LOWMEM_FAMILIES
        )
        stress(factors, lowmem=True, only=fams)
    elif len(sys.argv) > 3 and sys.argv[1] == "--chunk":
        _run_chunk(sys.argv[2], sys.argv[3])
    else:
        main()
