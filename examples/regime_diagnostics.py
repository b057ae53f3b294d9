#!/usr/bin/env python
"""Time-series regime diagnostics: the round-13 surface composed as
the decision tree an on-call analyst actually walks, per event type,
over daily value sums — every step a registry operator with a driver
oracle:

1. *Is there a trend at all, or just noise?* ``mann_kendall``
   (monotone S), cross-examined by ``turning_points_test`` (too few
   local extrema = persistence) and ``runs_test`` (level runs).
2. *Is the "trend" a drifting random walk or a real level?*
   ``dickey_fuller`` — if the series has a unit root, level z-gates
   and mean baselines are meaningless.
3. *If the level shifted — WHEN?* ``pettitt_test`` finds the most
   probable changepoint with no hypothesized date (``chow_test``
   needs one).
4. *What happens next if level+slope persist?* ``holt_linear`` —
   the exact dyadic α=β=½ double-exponential forecast.
5. *How bad did it get on the way?* ``max_drawdown`` of the
   cumulative curve — the mid-month crater a running total hides.
6. *Does one series LEAD another?* ``granger_causality`` — clicks
   vs purchase revenue at lag 1, the directional claim the symmetric
   ``ccf`` cannot make.

Everything is one bucket hash-agg + bounded-grain windows; nothing
collects but the few-row readouts printed here.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

from pyspark.sql import functions as F

from pybabe_spark import Babe, get_spark
from pybabe_spark.sources.io import read_table


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("regime_diagnostics")
    ev = read_table(spark, sf_dir, "events")
    b = Babe(ev)
    day = 86400

    print("== 1. trend? (Mann-Kendall / turning points) ==")
    b.mann_kendall("event_type", "ts", "value", day).df.show(5, False)
    b.turning_points_test("event_type", "ts", "value", bucket_seconds=day).df.show(
        5, False
    )

    print("== 2. unit root or mean reversion? (Dickey-Fuller) ==")
    b.dickey_fuller("event_type", "ts", "value", bucket_seconds=day).df.show(
        5, False
    )

    print("== 3. when did the level shift? (Pettitt) ==")
    b.pettitt_test("event_type", "ts", "value", bucket_seconds=day).df.show(
        5, False
    )

    print("== 4. what next? (Holt linear, 3-day horizon) ==")
    b.holt_linear(
        "event_type", "ts", "value", bucket_seconds=day, horizon=3
    ).df.show(5, False)

    print("== 5. worst peak-to-trough? (max drawdown) ==")
    b.max_drawdown("event_type", "ts", "value", bucket_seconds=day).df.show(
        5, False
    )

    print("== 6. do clicks LEAD purchases? (Granger, lag 1) ==")
    pair = Babe(
        ev.filter(F.col("event_type").isin("click", "purchase")).select(
            F.lit("events").alias("series"),
            "ts",
            F.when(F.col("event_type") == "click", F.col("value"))
            .otherwise(F.lit(0.0))
            .alias("click_value"),
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(F.lit(0.0))
            .alias("purchase_value"),
        )
    )
    pair.granger_causality(
        "series", "ts", "click_value", "purchase_value", bucket_seconds=day
    ).df.show(5, False)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
