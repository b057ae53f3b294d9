"""Multi-touch conversion attribution over event streams.

Beyond-reference capability: the standard web-analytics question the
engine's event family (sessionize / funnel / retention / transitions)
stops short of — "which channel gets credit for each conversion?".
Three classic models:

- ``last``  — the most recent touch inside the lookback window gets
  full credit (the default in most analytics products).
- ``first`` — the earliest touch inside the window gets full credit.
- ``linear`` — credit is split evenly across all touches in the window.
- ``u_shaped`` — position-based: 40% to the first touch, 40% to the
  last, 20% split across the middle (full/half credit for 1/2-touch
  journeys).
- ``time_decay`` — recency-weighted with an exact one-day half-life:
  a touch aged ``d`` whole days carries weight ``2^(lookback−1−d)``,
  credits are ``1e6·wᵢ // Σw``. Powers of two BY DESIGN — an arbitrary
  decay constant would put transcendental weights inside the exact
  integer pipeline (the house determinism hazard); day-granular ages
  keep the weight set small and the division exact. ``lookback_days``
  is capped at 30 for this model (the weight fits a bigint with room).

Conversions with NO touch inside their lookback window are credited to
the ``(none)`` channel, so per-channel credits always total the
conversion count (up to the documented linear-model floor truncation).

Scale shape (100 TB): one equi-join on the user key (conversions ×
touches of the SAME user, range-filtered to the lookback window) — the
join never leaves the user's partition, so skew is bounded by per-user
activity, exactly like the engine's interval join
(``operators/join.py::interval_join``). The per-conversion rank/count
window partitions by conversion id (millions of tiny partitions, never
a funnel). The final per-channel rollup is a hash aggregation on a
low-cardinality key.

Cross-engine determinism: credits are exact integers in MICRO units
(``1_000_000 // n_touches`` for linear; 1e6 for full credit), attributed
value is ``cents × micro-credit`` accumulated in DECIMAL(38,0)
(HUGEINT-equivalent — immune to bigint overflow at any corpus size),
and ties inside a window break on (timestamp, event id). The linear
model floors: a conversion with n touches distributes ``n·(1e6 // n)``
micro-credits — up to ``n−1`` millionths per conversion are truncated,
identically on every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pybabe_spark.operators._util import gen_col

#: one full conversion credit, in micro units
CREDIT_SCALE = 1_000_000

_MODELS = ("last", "first", "linear", "u_shaped", "time_decay")


def attribute_conversions(
    events: DataFrame,
    conversion: Column,
    touch: Column,
    channel_col: str,
    model: str = "last",
    lookback_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str | None = None,
) -> DataFrame:
    """Per-channel attribution report:
    ``(channel, credit_micro, attributed_value, conversions, touches)``.

    ``conversion`` / ``touch`` are boolean Columns selecting the two
    event roles (a row may match neither; matching both is the caller's
    modeling choice — the conversion row itself is never a touch for
    its own conversion because the window is strictly ``t_ts <
    conv_ts``). ``credit_micro`` is the exact integer credit in
    millionths of a conversion; ``conversions`` is the same as a double
    (whole numbers under ``last``/``first``). ``attributed_value``
    distributes each conversion's ``value_col`` (taken at 2-decimal
    money precision) proportionally to credit; NULL when ``value_col``
    is None.
    """
    if model not in _MODELS:
        raise ValueError(f"attribute_conversions: unknown model {model!r}")
    if lookback_days <= 0:
        raise ValueError("attribute_conversions: lookback_days must be > 0")
    if model == "time_decay" and lookback_days > 30:
        raise ValueError(
            "attribute_conversions: time_decay caps lookback_days at 30 "
            "(2^lookback weights stay exact bigints)"
        )
    u, t, i = user_col, ts_col, id_col
    convs = events.filter(conversion).select(
        F.col(u).alias("__cu"),
        F.col(t).alias("__cts"),
        F.col(i).alias("__cid"),
        (
            (F.col(value_col).cast("decimal(18,2)") * 100).cast("bigint")
            if value_col is not None
            else F.lit(0).cast("bigint")
        ).alias("__cents"),
    )
    touches = events.filter(touch).select(
        F.col(u).alias("__tu"),
        F.col(t).alias("__tts"),
        F.col(i).alias("__tid"),
        F.col(channel_col).alias("__ch"),
    )
    j = convs.join(
        touches,
        (F.col("__cu") == F.col("__tu"))
        & (F.col("__tts") < F.col("__cts"))
        & (
            F.col("__tts")
            >= F.col("__cts") - F.expr(f"INTERVAL {int(lookback_days)} DAYS")
        ),
        "left",
    )
    per_conv = Window.partitionBy("__cid")
    if model == "linear":
        # NULL channel (no touch) keeps n=0 → full credit to '(none)';
        # the split is exact bigint division (never float-floored)
        n = gen_col(j.columns, "__n")
        credit = F.when(
            F.col("__tid").isNull(), F.lit(CREDIT_SCALE).cast("bigint")
        ).otherwise(F.expr(f"CAST({CREDIT_SCALE} AS BIGINT) div {n}"))
        picked = j.withColumn(n, F.count("__tid").over(per_conv)).select(
            "__cid", "__cents", "__ch", "__tid", credit.alias("__credit")
        )
    elif model == "u_shaped":
        # 40% first touch, 40% last touch, 20% split across the middle
        # (the position-based standard); n=1 → full, n=2 → 50/50, so a
        # journey never loses credit to a missing middle. All exact
        # bigint arithmetic; middle split floors like linear.
        n = gen_col(j.columns, "__n")
        ra = gen_col(j.columns, "__ra")
        rd = gen_col(j.columns, "__rd")
        asc = [F.col("__tts").asc(), F.col("__tid").asc()]
        desc = [F.col("__tts").desc(), F.col("__tid").desc()]
        forty = (CREDIT_SCALE * 2) // 5
        credit = (
            F.when(F.col("__tid").isNull(), F.lit(CREDIT_SCALE))
            .when(F.col(n) == 1, F.lit(CREDIT_SCALE))
            .when(F.col(n) == 2, F.lit(CREDIT_SCALE // 2))
            .when(F.col(ra) == 1, F.lit(forty))
            .when(F.col(rd) == 1, F.lit(forty))
            .otherwise(
                F.expr(
                    f"CAST({CREDIT_SCALE - 2 * forty} AS BIGINT)"
                    f" div ({n} - 2)"
                )
            )
            .cast("bigint")
        )
        picked = (
            j.withColumn(n, F.count("__tid").over(per_conv))
            .withColumn(ra, F.row_number().over(per_conv.orderBy(*asc)))
            .withColumn(rd, F.row_number().over(per_conv.orderBy(*desc)))
            .select(
                "__cid", "__cents", "__ch", "__tid", credit.alias("__credit")
            )
        )
    elif model == "time_decay":
        # whole-day age (floor of the micros delta) → weight 2^(L-1-d);
        # Σw per conversion via a window; credit = 1e6·w div Σw — all
        # exact bigints. age ∈ [0, L) inside the join window by
        # construction, so the exponent never goes negative.
        age = gen_col(j.columns, "__age")
        wcol = gen_col(j.columns, "__w")
        sw = gen_col(j.columns, "__sw")
        age_expr = F.expr(
            "CAST((unix_micros(__cts) - unix_micros(__tts))"
            f" div {86_400_000_000} AS INT)"
        )
        weight = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), {lookback_days - 1} - {age})"
        )
        credit = F.when(
            F.col("__tid").isNull(), F.lit(CREDIT_SCALE).cast("bigint")
        ).otherwise(
            F.expr(f"CAST({CREDIT_SCALE} AS BIGINT) * {wcol} div {sw}")
        )
        picked = (
            j.withColumn(age, age_expr)
            .withColumn(wcol, F.when(F.col("__tid").isNotNull(), weight))
            .withColumn(sw, F.sum(wcol).over(per_conv))
            .select(
                "__cid", "__cents", "__ch", "__tid", credit.alias("__credit")
            )
        )
    else:
        order = (
            [F.col("__tts").desc(), F.col("__tid").desc()]
            if model == "last"
            else [F.col("__tts").asc(), F.col("__tid").asc()]
        )
        # NULL ordering is immaterial: a conversion row pairs with NULL
        # only when it has no touches at all (left join), so its
        # partition is exactly the one unattributed row
        rk = gen_col(j.columns, "__rk")
        picked = (
            j.withColumn(rk, F.row_number().over(per_conv.orderBy(*order)))
            .filter(F.col(rk) == 1)
            .select(
                "__cid",
                "__cents",
                "__ch",
                "__tid",
                F.lit(CREDIT_SCALE).cast("bigint").alias("__credit"),
            )
        )
    out = (
        picked.withColumn("__ch", F.coalesce(F.col("__ch"), F.lit("(none)")))
        .groupBy(F.col("__ch").alias("channel"))
        .agg(
            F.sum(F.col("__credit").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("__cr"),
            F.sum(
                (F.col("__cents") * F.col("__credit")).cast("decimal(38,0)")
            ).alias("__val"),
            F.count("__tid").alias("touches"),
        )
    )
    return out.select(
        "channel",
        F.col("__cr").cast("bigint").alias("credit_micro"),
        (F.col("__cr").cast("double") / CREDIT_SCALE).alias("conversions"),
        (
            (F.col("__val").cast("double") / (CREDIT_SCALE * 100.0))
            if value_col is not None
            else F.lit(None).cast("double")
        ).alias("attributed_value"),
        "touches",
    )


def attribution_sql(
    conversion_where: str,
    touch_where: str,
    channel_expr: str,
    model: str = "last",
    lookback_days: int = 7,
    value_expr: str | None = None,
    table: str = "events",
) -> str:
    """DuckDB mirror of :func:`attribute_conversions` over ``events``
    (same micro-integer credits, same window, same tiebreaks)."""
    if model not in _MODELS:
        raise ValueError(f"attribution_sql: unknown model {model!r}")
    cents = (
        f"CAST(CAST({value_expr} AS DECIMAL(18,2)) * 100 AS BIGINT)"
        if value_expr is not None
        else "CAST(0 AS BIGINT)"
    )
    if model == "linear":
        pick = f"""
    picked AS (
      SELECT cid, cents, ch, tid,
             CASE WHEN tid IS NULL THEN {CREDIT_SCALE}
                  ELSE {CREDIT_SCALE} // COUNT(tid) OVER (PARTITION BY cid)
             END AS credit
      FROM j
    )"""
    elif model == "time_decay":
        pick = f"""
    aged AS (
      SELECT cid, cents, ch, tid,
             CASE WHEN tid IS NOT NULL THEN
               (CAST(1 AS BIGINT) << ({{L1}} - (epoch_us(cts) - epoch_us(tts)) // {86_400_000_000}))
             END AS w
      FROM j
    ),
    picked AS (
      SELECT cid, cents, ch, tid,
             CASE WHEN tid IS NULL THEN CAST({CREDIT_SCALE} AS BIGINT)
                  ELSE CAST({CREDIT_SCALE} AS BIGINT) * w
                       // SUM(w) OVER (PARTITION BY cid)
             END AS credit
      FROM aged
    )""".replace("{L1}", str(int(lookback_days) - 1))
    elif model == "u_shaped":
        forty = (CREDIT_SCALE * 2) // 5
        pick = f"""
    ranked AS (
      SELECT cid, cents, ch, tid,
             COUNT(tid) OVER (PARTITION BY cid) AS n,
             ROW_NUMBER() OVER (PARTITION BY cid
               ORDER BY tts ASC NULLS LAST, tid ASC NULLS LAST) AS ra,
             ROW_NUMBER() OVER (PARTITION BY cid
               ORDER BY tts DESC NULLS LAST, tid DESC NULLS LAST) AS rd
      FROM j
    ),
    picked AS (
      SELECT cid, cents, ch, tid,
             CAST(CASE WHEN tid IS NULL THEN {CREDIT_SCALE}
                  WHEN n = 1 THEN {CREDIT_SCALE}
                  WHEN n = 2 THEN {CREDIT_SCALE // 2}
                  WHEN ra = 1 THEN {forty}
                  WHEN rd = 1 THEN {forty}
                  ELSE {CREDIT_SCALE - 2 * forty} // (n - 2)
             END AS BIGINT) AS credit
      FROM ranked
    )"""
    else:
        direction = "DESC" if model == "last" else "ASC"
        pick = f"""
    ranked AS (
      SELECT cid, cents, ch, tid,
             ROW_NUMBER() OVER (
               PARTITION BY cid
               ORDER BY tts {direction} NULLS LAST, tid {direction} NULLS LAST
             ) AS rk
      FROM j
    ),
    picked AS (
      SELECT cid, cents, ch, tid, CAST({CREDIT_SCALE} AS BIGINT) AS credit
      FROM ranked WHERE rk = 1
    )"""
    val = (
        f"CAST(CAST(SUM(CAST(cents AS HUGEINT) * credit) AS DOUBLE) "
        f"/ {CREDIT_SCALE * 100.0} AS DOUBLE)"
        if value_expr is not None
        else "CAST(NULL AS DOUBLE)"
    )
    return f"""
    WITH convs AS (
      SELECT user_id AS cu, ts AS cts, event_id AS cid, {cents} AS cents
      FROM {table} WHERE {conversion_where}
    ),
    touches AS (
      SELECT user_id AS tu, ts AS tts, event_id AS tid,
             {channel_expr} AS ch
      FROM {table} WHERE {touch_where}
    ),
    j AS (
      SELECT c.cid, c.cents, c.cts, t.ch, t.tid, t.tts
      FROM convs c LEFT JOIN touches t
        ON c.cu = t.tu AND t.tts < c.cts
       AND t.tts >= c.cts - INTERVAL {int(lookback_days)} DAY
    ),{pick}
    SELECT COALESCE(ch, '(none)') AS channel,
           CAST(SUM(CAST(credit AS HUGEINT)) AS BIGINT) AS credit_micro,
           CAST(CAST(SUM(CAST(credit AS HUGEINT)) AS DOUBLE)
                / {CREDIT_SCALE} AS DOUBLE) AS conversions,
           {val} AS attributed_value,
           CAST(COUNT(tid) AS BIGINT) AS touches
    FROM picked GROUP BY COALESCE(ch, '(none)')
    """
