"""Oracle parity for the bench TOP-12 heavy keys at sf0.1 — one scale
past the driver's correctness gate.

Round-11 verdict ask #6: the sf0.01 gate (`test_oracle_parity_sf01.py`)
closed the rmst class, but keys whose INTERMEDIATE grains grow with
data volume (rank tables, KM curves, resample sums, CC edge lists) can
still hit a decimal-overflow or rounding-grid divergence that only
appears at sf0.1 — denser value grids mean more chances for Spark's
BigDecimal rounding and DuckDB's double-space rounding to disagree on
some cell. This file runs the twelve most expensive bench keys' full
DuckDB comparison once at sf0.1.

Gated: ~2-4 minutes of work both engines, so it only runs when
``PYBABE_SF1_PARITY=1`` is set (the per-round evidence run —
``PYBABE_SF1_PARITY=1 python -m pytest tests/test_oracle_parity_sf1.py
-q``); the default suite skips it.
"""

import os

import pytest

from pybabe_spark.queries import REGISTRY, all_queries
from tests.compare import assert_frames_match

SF1_DIR = os.environ.get("PYBABE_SF1_DIR", "/root/testdata/sf0.1")

#: the bench top-12 by BENCH_DETAIL wall time (r11→r12): every family
#: with a data-volume-growing intermediate grain is represented —
#: Poisson resample sums (bootstrap), iterative CC label tables
#: (label_propagation), agreement-pattern joins (fellegi_sunter),
#: hashed-ngram importance weights (dsir), exact rank grains
#: (spearman, kruskal, dunn), gradient-descent scoring
#: (quality_classifier), co-occurrence wedges (item_neighbors),
#: per-token backoff joins (lm_perplexity), lag-grain moment sums
#: (acf).
#:
#: Two bench-heavy keys are EXCLUDED here with cause, not silently:
#: `entity_resolution_customers` and `fuzzy_pairs_customer_names`
#: carry deliberately-quadratic ORACLE definitions (all-pairs
#: levenshtein over every customer pair, plus a recursive-CTE
#: reachability for ER) — that is the quarantined oracle-side cost
#: the engine's delete-blocking exists to avoid, and at sf0.1 it is
#: 225M levenshtein pairs multiplied by DuckDB CTE inlining (a probe
#: run made no progress in 30+ minutes). Their sf0.01 driver rows and
#: the full local parity suite remain the evidence for those two; the
#: next-heaviest tractable keys take their slots.
TOP12 = [
    "bootstrap_ci_orders",
    "label_propagation_trade",
    "fellegi_sunter_customers",
    "dsir_sample_docs",
    "spearman_lineitem",
    "quality_classifier_docs",
    "item_neighbors_parts",
    "lm_perplexity_docs",
    "dunn_test_lineitem",
    "kruskal_wallis_lineitem",
    "acf_user_values",
    "quality_classifier_eval",
]

all_queries()
CASES = [(n, *REGISTRY[n]) for n in TOP12 if n in REGISTRY and REGISTRY[n][1]]


@pytest.fixture(scope="module")
def duck1():
    import duckdb

    if os.environ.get("PYBABE_SF1_PARITY") != "1":
        pytest.skip("sf0.1 parity gate: set PYBABE_SF1_PARITY=1 to run")
    if not os.path.isdir(SF1_DIR):
        pytest.skip(f"sf0.1 testdata not present at {SF1_DIR}")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        path = os.path.join(SF1_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_sf1_parity_top12(spark, duck1, name, fn, sql):
    assert_frames_match(fn(spark, SF1_DIR), duck1.sql(sql), name)
