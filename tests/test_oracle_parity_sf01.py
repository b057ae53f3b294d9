"""Oracle parity for numerically-delicate keys at sf0.01 — the
DRIVER'S scale, not the conftest default sf0.001.

Round-10 lesson (`VERDICT.md` r10 "What's wrong" #2/#3): `rmst_events`
passed the sf0.001 parity suite but hash-mismatched at the driver's
sf0.01, because its KM curve only grows enough steps at the larger
scale to hit an 18-significant-digit product where Spark's exact
BigDecimal rounding and DuckDB's double-space rounding diverge. Any
key whose finish involves rounding (decimal casts, integral ppm,
rank machinery, survival-step products) is in this class: the grid
points two engines can disagree on get denser with data volume, so
the local gate must run at the scale the driver uses.

This file re-runs exactly those families at sf0.01 with its own
module-scoped DuckDB connection (the session `duck`/`sf_dir` fixtures
stay at the fast default for the rest of the registry). ~38 keys
(every round-11 addition included), each a few seconds — cheap
insurance that rmst-class drift reproduces locally before the driver
sees it.
"""

import os
import re

import pytest

from pybabe_spark.queries import REGISTRY, all_queries
from tests.compare import assert_frames_match

SF01_DIR = os.environ.get("PYBABE_SF01_DIR", "/root/testdata/sf0.01")

#: families whose cross-engine equality depends on rounding grids:
#: survival (KM/NA/RMST/log-rank), rank statistics, decimal/ppm
#: finishes of moment-based tests, quantile pickers, log-space fits.
_DELICATE = re.compile(
    r"rmst|km_|nelson|logrank|spearman|kruskal|mann_whitney|ks_test"
    r"|cliffs|anova|brown_forsythe|durbin|ljung|bootstrap|wilson"
    r"|proportion_ci|delta_method|kappa|brier|mcnemar|chi2|zipf"
    r"|js_divergence|llr|quantile|percentile|sample_size|centroid_drift"
    r"|seasonal_decompose|snaive_forecast|forecast_backtest|stickiness"
    r"|g_test|fleiss|dunn|eb_shrink"
    r"|roc_auc|gains_table|vocab_overlap|readability|feature_hash"
    # r12 additions: every new op whose finish rounds (decimal casts,
    # integral ppm, rank machinery, per-term-rounded sums)
    r"|tukey|friedman|kendall|partial_corr|odds_ratio|page_trend"
    r"|cochran|mcc_|pr_auc|ece_|bollinger|lorenz|herfindahl"
    r"|assortativity|jaccard_links|grubbs|runs_test|lsh_calibration"
    # r13 additions: trend z-scores, Gumbel fits, structural-break F,
    # reliability/dispersion ppm, EMD, conformal ranks, covariance ppm
    r"|mann_kendall|gumbel|chow_break|cronbach|overdispersion"
    r"|wasserstein|hosmer|conformal|covariance_|acf_bucketed|gesd|nemenyi|winrate"
    # r13 batch 2: median-split chi2, trend z, log-variance chi2
    r"|mood_median|bartlett"
    # r13 batch 3: standardized-moment JB, entropy-style Theil,
    # doubled-rank JT, sign-U Pettitt, dyadic Holt, residual-square
    # LM, ppm-rate equalized odds, winnowed density ppm
    r"|jarque_bera|theil_|jonckheere|pettitt|holt_linear"
    r"|breusch_pagan|equalized_odds|winnow_"
    # r13 batch 4: cumulative-curve drawdown epochs, DF tau
    r"|max_drawdown|dickey_fuller"
    # r13 batch 5: two-regressor F, per-term basket indices
    r"|granger|price_index|turning_points|youden|cmh_"
)

all_queries()
DELICATE_CASES = [
    (n, fn, sql)
    for n, (fn, sql) in REGISTRY.items()
    if sql and _DELICATE.search(n)
]


@pytest.fixture(scope="module")
def duck01():
    import duckdb

    if not os.path.isdir(SF01_DIR):
        pytest.skip(f"sf0.01 testdata not present at {SF01_DIR}")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        path = os.path.join(SF01_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name,fn,sql", DELICATE_CASES, ids=[c[0] for c in DELICATE_CASES]
)
def test_oracle_parity_sf01(spark, duck01, name, fn, sql):
    sdf = fn(spark, SF01_DIR)
    rel = duck01.sql(sql)
    assert_frames_match(sdf, rel, f"{name}@sf0.01")
