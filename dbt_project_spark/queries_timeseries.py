"""Time-series family over `events` (round 2, session 2): OHLC
downsampling, duration-weighted averages, and time-RANGE trailing
windows — the resample/rollup primitives of a metrics store.

Determinism notes: `value` carries exactly 2 decimals, so all sums
run in ×100 fixed point (`CAST(round(value*100, 0) AS BIGINT)`) with
one final double division. Row identity inside a window is ordered by
(ts, event_id); the oracle encodes that composite as a zero-padded
string key because DuckDB's arg_min/arg_max take no struct ordering
(Spark's min_by/max_by order structs natively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_project_spark.catalog import register
from dbt_project_spark.sources import load_table

_V100 = "CAST(round(value * 100, 0) AS BIGINT)"
# Zero-padded lexicographic == (ts, event_id) numeric order.
_OKEY = (
    "strftime(CAST(ts AS TIMESTAMP), '%Y%m%d%H%M%S%f')"
    " || lpad(CAST(event_id AS VARCHAR), 12, '0')"
)
OHLC_BUCKET_S = 900  # 15-minute bars


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").withColumn(
        "value100", F.round(F.col("value") * 100, 0).cast("bigint")
    )


@register(
    "ohlc_resample",
    oracle=f"""
    WITH e AS (SELECT event_type,
                      CAST(floor(epoch(CAST(ts AS TIMESTAMP))/{OHLC_BUCKET_S})
                           * {OHLC_BUCKET_S} AS BIGINT) AS bar_epoch,
                      {_V100} AS v100, {_OKEY} AS okey
               FROM events)
    SELECT event_type, bar_epoch,
           arg_min(v100, okey) / 100.0 AS open,
           MAX(v100) / 100.0 AS high,
           MIN(v100) / 100.0 AS low,
           arg_max(v100, okey) / 100.0 AS close,
           COUNT(*) AS n_events,
           CAST(SUM(v100) AS BIGINT) / 100.0 AS total_value
    FROM e GROUP BY event_type, bar_epoch
    """,
)
def ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar downsampling: per (event_type, 15-min bar) the first /
    max / min / last value plus volume — the classic metrics-store
    resample.

    Scale shape: ONE hash aggregation. open/close use min_by/max_by
    over a (ts, event_id) struct — unlike a row_number window, these
    get map-side partial aggregation (each task keeps one candidate
    row per (type, bar) before the shuffle), so shuffle volume is
    bars×types, independent of event count.
    """
    e = _events(spark, sf_dir).select(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / OHLC_BUCKET_S) * OHLC_BUCKET_S)
        .cast("bigint")
        .alias("bar_epoch"),
        "value100",
        F.struct(F.col("ts"), F.col("event_id")).alias("okey"),
    )
    return e.groupBy("event_type", "bar_epoch").agg(
        (F.min_by("value100", "okey") / 100.0).alias("open"),
        (F.max("value100") / 100.0).alias("high"),
        (F.min("value100") / 100.0).alias("low"),
        (F.max_by("value100", "okey") / 100.0).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        (F.sum("value100") / 100.0).alias("total_value"),
    )


@register(
    "twa_by_type_day",
    oracle=f"""
    WITH e AS (SELECT event_type,
                      CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS eu,
                      {_V100} AS v100, {_OKEY} AS okey
               FROM events),
    w AS (SELECT event_type, day, v100,
                 lead(eu) OVER (PARTITION BY event_type, day ORDER BY okey)
                     - eu AS dur_us
          FROM e)
    SELECT event_type, day,
           COUNT(*) AS n_intervals,
           CAST(SUM(v100 * dur_us) AS BIGINT)
               / (100.0 * CAST(SUM(dur_us) AS BIGINT)) AS twa_value
    FROM w WHERE dur_us IS NOT NULL
    GROUP BY event_type, day
    """,
)
def twa_by_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (event_type, day): each sample
    holds until the next one, so it is weighted by its duration —
    the correct average for irregularly-sampled gauges (a plain AVG
    over-weights bursts). The day's last sample has no successor and
    contributes no interval.

    Scale shape: the lead() window partitions by (type, day) — state
    per window is one row, and the partition key is bounded (types ×
    days), so no executor ever holds more than a day of one type.
    All math is exact int64 (µs durations × fixed-point values); the
    single double division happens after both sums close.
    """
    e = _events(spark, sf_dir).select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("eu"),
        "value100",
        "ts",
        "event_id",
    )
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    d = e.withColumn("dur_us", F.lead("eu").over(w) - F.col("eu")).filter(
        F.col("dur_us").isNotNull()
    )
    return d.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        (
            F.sum(F.col("value100") * F.col("dur_us")).cast("bigint")
            / (F.lit(100.0) * F.sum("dur_us").cast("bigint"))
        ).alias("twa_value"),
    )


@register(
    "win_time_range_avg",
    oracle=f"""
    WITH e AS (SELECT event_id, user_id,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS eu,
                      {_V100} AS v100
               FROM events)
    SELECT event_id,
           CAST(COUNT(*) OVER tw AS BIGINT) AS n_in_window,
           CAST(SUM(v100) OVER tw AS BIGINT)
               / (100.0 * COUNT(*) OVER tw) AS avg_10min
    FROM e
    WINDOW tw AS (PARTITION BY user_id ORDER BY eu
                  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
    """,
)
def win_time_range_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing 10-minute average of the user's values — a
    time-RANGE frame (value-based, in µs), not a row-count frame: the
    window widens and narrows with event density, which ROWS BETWEEN
    cannot express.

    Tie semantics make this deterministic without a tie-break column:
    a RANGE frame includes ALL peers of the current order key, so
    events sharing a timestamp see identical frames in both engines.
    Partitioned by user_id — bounded state per user, no global sort.
    """
    e = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("eu"),
        "value100",
    )
    tw = (
        Window.partitionBy("user_id")
        .orderBy("eu")
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        F.count(F.lit(1)).over(tw).cast("bigint").alias("n_in_window"),
        (
            F.sum("value100").over(tw).cast("bigint")
            / (F.lit(100.0) * F.count(F.lit(1)).over(tw))
        ).alias("avg_10min"),
    )


GRID_STEP_S = 900  # 15-minute interpolation grid


@register(
    "resample_interpolate",
    oracle=f"""
    WITH obs AS (SELECT event_type,
                        CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ep,
                        {_V100} AS v100, event_id
                 FROM events),
    bounds AS (SELECT event_type,
                      (MIN(ep) + {GRID_STEP_S} - 1) // {GRID_STEP_S}
                          * {GRID_STEP_S} AS gmin,
                      MAX(ep) // {GRID_STEP_S} * {GRID_STEP_S} AS gmax
               FROM obs GROUP BY event_type),
    grid AS (SELECT event_type,
                    unnest(generate_series(gmin, gmax, {GRID_STEP_S})) AS ep
             FROM bounds),
    u AS (SELECT event_type, ep, v100, 0 AS is_grid, event_id FROM obs
          UNION ALL
          SELECT event_type, ep, NULL, 1, NULL FROM grid),
    filled AS (
      SELECT event_type, ep, is_grid,
             last_value(v100 IGNORE NULLS) OVER wb AS prev_v,
             last_value(CASE WHEN is_grid = 0 THEN ep END IGNORE NULLS)
                 OVER wb AS prev_t,
             first_value(v100 IGNORE NULLS) OVER wf AS next_v,
             first_value(CASE WHEN is_grid = 0 THEN ep END IGNORE NULLS)
                 OVER wf AS next_t
      FROM u
      WINDOW wb AS (PARTITION BY event_type
                    ORDER BY ep, is_grid, COALESCE(event_id, -1)
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY event_type
                    ORDER BY ep, is_grid, COALESCE(event_id, -1)
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_type, ep AS grid_epoch,
           CAST(CASE WHEN next_t = prev_t THEN prev_v
                     ELSE prev_v + (next_v - prev_v) * (ep - prev_t)
                          // (next_t - prev_t)
                END AS BIGINT) / 100.0 AS value
    FROM filled
    WHERE is_grid = 1 AND prev_v IS NOT NULL AND next_v IS NOT NULL
    """,
)
def resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation onto a regular 15-min grid per event_type
    (the metrics-store resample that gap_filled zero-filling can't do):
    union the grid points into the sample stream, forward-fill the
    last observation and backward-fill the next with IGNORE NULLS
    window frames, interpolate in ×100 fixed point with integer
    division (Spark `div` and DuckDB `//` both truncate — verified
    including negative deltas).

    One event_type partitioning carries both fill directions (two
    frames over the SAME sort — one exchange, one sort). Scale note:
    partitioning by bare event_type is fine at 5 types × month; at
    100 TB you'd composite-key to (type, day) and overlap one
    observation either side of each day boundary.
    """
    ev = _events(spark, sf_dir).withColumn(
        "ep", F.unix_timestamp("ts")
    )
    obs = ev.select(
        "event_type", "ep", F.col("value100").alias("v100"), "event_id"
    )
    step = GRID_STEP_S
    bounds = obs.groupBy("event_type").agg(
        (F.expr(f"(min(ep) + {step} - 1) div {step}") * step).alias("gmin"),
        (F.expr(f"max(ep) div {step}") * step).alias("gmax"),
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("gmin", "gmax", F.lit(step))).alias("ep"),
    )
    u = obs.select(
        "event_type", "ep", "v100", F.lit(0).alias("is_grid"), "event_id"
    ).unionByName(
        grid.select(
            "event_type",
            "ep",
            F.lit(None).cast("bigint").alias("v100"),
            F.lit(1).alias("is_grid"),
            F.lit(None).cast("bigint").alias("event_id"),
        )
    )
    # Backward fill via the REVERSED sort with a running
    # [unboundedPreceding, current] frame: Spark evaluates running
    # frames in O(n) with incremental state, but a literal
    # [current, unboundedFollowing] frame with ignoreNulls re-scans
    # the tail per row — measured O(n²): 73 s vs ~2 s at sf0.1.
    # The reversed running `last` is element-for-element identical to
    # the forward `first` over the following frame (the oracle keeps
    # the forward formulation; DuckDB evaluates it efficiently).
    fwd = [F.col("ep"), F.col("is_grid"), F.coalesce("event_id", F.lit(-1))]
    rev = [c.desc() for c in fwd]
    wb = (
        Window.partitionBy("event_type")
        .orderBy(*fwd)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy(*rev)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_ep = F.when(F.col("is_grid") == 0, F.col("ep"))
    filled = u.select(
        "event_type",
        "ep",
        "is_grid",
        F.last("v100", ignorenulls=True).over(wb).alias("prev_v"),
        F.last(obs_ep, ignorenulls=True).over(wb).alias("prev_t"),
        F.last("v100", ignorenulls=True).over(wf).alias("next_v"),
        F.last(obs_ep, ignorenulls=True).over(wf).alias("next_t"),
    )
    return (
        filled.filter(
            (F.col("is_grid") == 1)
            & F.col("prev_v").isNotNull()
            & F.col("next_v").isNotNull()
        )
        .select(
            "event_type",
            F.col("ep").alias("grid_epoch"),
            (
                F.when(F.col("next_t") == F.col("prev_t"), F.col("prev_v"))
                .otherwise(
                    F.col("prev_v")
                    + F.expr(
                        "(next_v - prev_v) * (ep - prev_t) div (next_t - prev_t)"
                    )
                )
                .cast("bigint")
                / F.lit(100.0)
            ).alias("value"),
        )
    )


EWMA_K = 8  # trailing points in the dyadic EWMA kernel


def _ewma_oracle() -> str:
    # weight of lag k is 2^(K-1-k): newest point heaviest; integer
    # numerator/denominator, one final double division.
    num = " + ".join(
        f"COALESCE(lag(v100, {k}) OVER w * {2 ** (EWMA_K - 1 - k)}, 0)"
        for k in range(EWMA_K)
    )
    den = " + ".join(
        f"(CASE WHEN lag(v100, {k}) OVER w IS NOT NULL"
        f" THEN {2 ** (EWMA_K - 1 - k)} ELSE 0 END)"
        for k in range(EWMA_K)
    )
    return f"""
    WITH e AS (SELECT event_id, user_id, {_V100} AS v100, {_OKEY} AS okey
               FROM events)
    SELECT event_id, user_id,
           ROUND(({num}) / (({den}) * 100.0), 6) AS ewma
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY okey)
    """


@register("ts_ewma_dyadic", oracle=_ewma_oracle())
def ts_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average with EXACT dyadic
    weights: an 8-point truncated EWMA kernel (α=1/2) whose weights
    2^(K-1-k) are integers, so the running state is an integer
    (numerator, denominator) pair and the only float op is the final
    division — bit-identical across engines, unlike a recursive
    s=αx+(1-α)s whose float error accumulates order-dependently.

    Scale shape: one window (partition by user, order by time) with 8
    lags — single shuffle, codegen'd, no self-joins. The truncation is
    principled: with α=1/2 the dropped tail weight is 2^-8 < 0.4%."""
    e = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "value100",
        F.expr(
            "concat(date_format(ts, 'yyyyMMddHHmmssSSS'), '000',"
            " lpad(cast(event_id as string), 12, '0'))"
        ).alias("okey"),
    )
    w = Window.partitionBy("user_id").orderBy("okey")
    num = sum(
        (
            F.coalesce(
                F.lag("value100", k).over(w) * F.lit(2 ** (EWMA_K - 1 - k)),
                F.lit(0),
            )
            for k in range(EWMA_K)
        ),
        F.lit(0),
    )
    den = sum(
        (
            F.when(
                F.lag("value100", k).over(w).isNotNull(),
                F.lit(2 ** (EWMA_K - 1 - k)),
            ).otherwise(F.lit(0))
            for k in range(EWMA_K)
        ),
        F.lit(0),
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(num / (den * F.lit(100.0)), 6).alias("ewma"),
    )


ANOM_WIN = 16  # trailing window (excluding current row)
ANOM_MIN_N = 8  # minimum history before flagging
ANOM_SIGMA2 = 4  # threshold: |x - mean| > 2*sigma, squared


@register(
    "ts_anomaly_sigma",
    oracle=f"""
    WITH e AS (SELECT event_id, user_id, {_V100} AS v100, {_OKEY} AS okey
               FROM events),
    stats AS (
      SELECT event_id, user_id, v100,
             COUNT(v100) OVER tw AS n,
             CAST(SUM(v100) OVER tw AS BIGINT) AS sx,
             CAST(SUM(v100 * v100) OVER tw AS BIGINT) AS sxx
      FROM e
      WINDOW tw AS (PARTITION BY user_id ORDER BY okey
                    ROWS BETWEEN {ANOM_WIN} PRECEDING AND 1 PRECEDING))
    SELECT event_id, user_id, v100 AS value100, n AS n_window,
           (n >= {ANOM_MIN_N} AND
            (v100 * n - sx) * (v100 * n - sx) >
              {ANOM_SIGMA2} * (n * sxx - sx * sx)) AS is_anomaly
    FROM stats
    """,
)
def ts_anomaly_sigma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flag with ZERO floating point: the
    classic |x−μ| > 2σ test over a trailing window, algebraically
    cleared of divisions — (x·n − Σx)² > 4(n·Σx² − (Σx)²) is a pure
    BIGINT inequality, so the flag is exact on every engine (no ulp
    tie risk at the threshold, unlike a float z-score).

    Scale shape: one window computes n/Σx/Σx² in a single pass
    (running-frame aggregates, map-side sorted within user
    partitions); the trailing frame EXCLUDES the current row so a
    spike can't mask itself. Overflow-safe: |v100|≤~3e6 and n≤16
    keep every term < 2^63."""
    e = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "value100",
        F.expr(
            "concat(date_format(ts, 'yyyyMMddHHmmssSSS'), '000',"
            " lpad(cast(event_id as string), 12, '0'))"
        ).alias("okey"),
    )
    tw = (
        Window.partitionBy("user_id")
        .orderBy("okey")
        .rowsBetween(-ANOM_WIN, -1)
    )
    x, n = F.col("value100"), F.col("n")
    sx, sxx = F.col("sx"), F.col("sxx")
    return (
        e.withColumn("n", F.count("value100").over(tw))
        .withColumn("sx", F.sum("value100").over(tw))
        .withColumn("sxx", F.sum(x * x).over(tw))
        .select(
            "event_id",
            "user_id",
            "value100",
            n.alias("n_window"),
            (
                (n >= ANOM_MIN_N)
                & (
                    (x * n - sx) * (x * n - sx)
                    > F.lit(ANOM_SIGMA2) * (n * sxx - sx * sx)
                )
            ).alias("is_anomaly"),
        )
    )
