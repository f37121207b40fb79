"""Event sessionization — gap-and-islands over the event stream.

New scope beyond the reference (like :mod:`maps_spark.streaming`): a
large-scale event pipeline needs user sessions, and the pair here
demonstrates the two canonical Spark shapes for it:

- :func:`sessionize_batch`: window-function gap-and-islands (lag ->
  break flag -> running sum -> groupBy). Pure Column expressions; the
  window partitions by ``user_id`` so the sort is per-user, never
  global, and the DuckDB oracle replays the identical ANSI SQL.
- ``streaming.sessions.sessionize_stream``: the same semantics as a
  custom stateful streaming operator via ``applyInPandasWithState``
  (open sessions ride in the state store, event-time timeouts close
  idle ones as the watermark advances).

Timestamps are epoch MICROseconds: the synthetic ``ts`` is
TIMESTAMP(MICROS) parquet, read by Spark as TIMESTAMP_NTZ and by DuckDB
as naive TIMESTAMP. Spark side converts with ``timestampdiff`` from the
NTZ epoch (session-timezone-independent — the gate may run under any
tz); DuckDB side uses ``epoch_us`` — both yield the identical int64.
``value`` is folded in as ``floor(value * 1000)`` per-row (exact in
both engines) so the session sum is an order-independent integer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

GAP_US_DEFAULT = 12 * 3600 * 1_000_000  # 12 hours

# epoch micros from the TIMESTAMP_NTZ `ts` — pure wall-clock arithmetic,
# unaffected by spark.sql.session.timeZone (a cast through TIMESTAMP
# would shift by the session offset; the oracle's epoch_us does not)
TS_US_SPARK = ("timestampdiff(MICROSECOND, "
               "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
TS_US_DUCKDB = "epoch_us(ts)"

SESSION_SCHEMA = ("user_id long, session_start long, session_end long, "
                  "n_events long, value_milli long")


def session_events(events: DataFrame) -> DataFrame:
    """Project the event columns sessionization needs, in the exact
    arithmetic both engines reproduce: (user_id, tus, event_id, vm)."""
    return events.select(
        "user_id",
        F.expr(TS_US_SPARK).cast("long").alias("tus"),
        "event_id",
        F.floor(F.col("value") * 1000).cast("long").alias("vm"))


def sessionize_batch(events: DataFrame,
                     gap_us: int = GAP_US_DEFAULT) -> DataFrame:
    """Per-user sessions: a new session starts when the gap since the
    previous event exceeds ``gap_us``.

    Output: (user_id, session_start, session_end, n_events,
    value_milli), timestamps in epoch microseconds.

    Scale: the only shuffle is the hash partition on ``user_id``; the
    window sort is per-user (bounded by one user's event count), and
    the final groupBy reuses the same partitioning, so AQE plans it
    shuffle-free.
    """
    e = session_events(events)
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    lag = F.lag("tus").over(w)
    brk = F.when(lag.isNull() | ((F.col("tus") - lag) > gap_us),
                 F.lit(1)).otherwise(F.lit(0))
    run = (Window.partitionBy("user_id").orderBy("tus", "event_id")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (e.withColumn("brk", brk)
            .withColumn("sid", F.sum("brk").over(run))
            .groupBy("user_id", "sid")
            .agg(F.min("tus").alias("session_start"),
                 F.max("tus").alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.sum("vm").alias("value_milli"))
            .select("user_id", "session_start", "session_end",
                    "n_events", "value_milli"))


def sessionize_sql(gap_us: int = GAP_US_DEFAULT,
                   events_table: str = "events",
                   ts_expr: str = TS_US_DUCKDB) -> str:
    """ANSI-SQL twin of :func:`sessionize_batch` (DuckDB oracle; also
    valid Spark SQL with ``ts_expr=TS_US_SPARK``)."""
    return f"""WITH e AS (
  SELECT user_id, CAST({ts_expr} AS BIGINT) AS tus, event_id,
         CAST(floor(value * 1000) AS BIGINT) AS vm
  FROM {events_table}),
flagged AS (
  SELECT user_id, tus, event_id, vm,
         CASE WHEN lag(tus) OVER (PARTITION BY user_id
                                  ORDER BY tus, event_id) IS NULL
                OR tus - lag(tus) OVER (PARTITION BY user_id
                                        ORDER BY tus, event_id) > {gap_us}
              THEN 1 ELSE 0 END AS brk
  FROM e),
sess AS (
  SELECT user_id, tus, vm,
         sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged)
SELECT user_id, min(tus) AS session_start, max(tus) AS session_end,
       count(*) AS n_events, CAST(sum(vm) AS BIGINT) AS value_milli
FROM sess GROUP BY user_id, sid"""


def funnel_stages(events: DataFrame,
                  steps: tuple[str, ...] = ("view", "click", "purchase")
                  ) -> DataFrame:
    """Ordered-funnel analysis: for each user, how far through the
    ``steps`` sequence their event history gets, where step i+1 must
    occur STRICTLY AFTER the (earliest qualifying) step i — the
    classic product-analytics subsequence match, made deterministic by
    always advancing through the minimum qualifying timestamp.

    Scale: one (user, step) pre-aggregation per stage, each an
    equi-join on user_id against the previous stage's (tiny, one row
    per surviving user) frame — k-1 user-keyed joins for a k-step
    funnel, never a window over the whole event stream.

    Output: (user_id, t1..tk epoch-micros nullable, stage_reached)
    with the prefix property (t_i null implies t_{i+1} null).
    """
    ev = events.select(
        "user_id", "event_type",
        F.expr(TS_US_SPARK).cast("long").alias("tus"))
    stages = []
    cur = (ev.where(F.col("event_type") == steps[0])
           .groupBy("user_id").agg(F.min("tus").alias("t1")))
    stages.append(cur)
    for i, s in enumerate(steps[1:], start=2):
        cur = (ev.where(F.col("event_type") == s)
               .join(cur.select("user_id", f"t{i - 1}"), "user_id")
               .where(F.col("tus") > F.col(f"t{i - 1}"))
               .groupBy("user_id").agg(F.min("tus").alias(f"t{i}")))
        stages.append(cur)
    out = ev.select("user_id").distinct()
    for st in stages:
        out = out.join(st, "user_id", "left")
    stage = sum((F.col(f"t{i}").isNotNull().cast("int")
                 for i in range(1, len(steps) + 1)), F.lit(0))
    return out.select(
        "user_id", *[f"t{i}" for i in range(1, len(steps) + 1)],
        stage.alias("stage_reached"))


def funnel_counts(events: DataFrame,
                  steps: tuple[str, ...] = ("view", "click", "purchase"),
                  scale: int = 1_000_000) -> DataFrame:
    """Funnel conversion table: users reaching AT LEAST stage k, with
    the conversion rate from the previous stage (integer-scaled).
    Stage 0 is "any event". One tiny aggregation over
    :func:`funnel_stages`' per-user frame."""
    st = funnel_stages(events, steps)
    per = (st.groupBy("stage_reached")
           .agg(F.count("*").alias("n")))
    grid = st.sparkSession.range(0, len(steps) + 1).select(
        F.col("id").cast("int").alias("stage"))
    reach = (grid.join(per, per.stage_reached >= F.col("stage"), "left")
             .groupBy("stage")
             .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n_users")))
    w = Window.orderBy("stage")  # k+1 rows — bounded by funnel depth
    return (reach.withColumn("prev_users", F.lag("n_users").over(w))
            .select(
                "stage", "n_users",
                F.when(F.col("prev_users") > 0,
                       F.expr(f"n_users * {scale} div prev_users"))
                .cast("long").alias("conv_from_prev_scaled"),
                F.element_at(F.lit(["(any)"] + list(steps)),
                             F.col("stage") + 1).alias("step")))


def cohort_retention(events: DataFrame,
                     period_us: int = 7 * 86400 * 1_000_000,
                     scale: int = 1_000_000) -> DataFrame:
    """Cohort retention: users grouped by first-activity period, then
    counted in each later period they return — the analytics-store
    staple. Periods are integer epoch-micros buckets (weeks by
    default), so the whole table is exact integer math.

    Scale: one distinct (user, period) aggregation, one broadcast-size
    per-user first-period frame joined back on user_id, one final
    (cohort, k) count — every shuffle keyed well below event
    cardinality.

    Output: (cohort_period, k, n_users, cohort_size, retained_scaled)
    where k = periods since the cohort's first (k=0 row counts the
    cohort itself).
    """
    ev = events.select(
        "user_id",
        F.expr(TS_US_SPARK).cast("long").alias("tus"))
    act = (ev.select("user_id",
                     F.expr(f"tus div {period_us}").alias("p"))
           .distinct())
    first = act.groupBy("user_id").agg(F.min("p").alias("cohort"))
    ret = (act.join(first, "user_id")
           .select("user_id", "cohort", (F.col("p") - F.col("cohort"))
                   .alias("k"))
           .groupBy("cohort", "k").agg(F.count("*").alias("n_users")))
    size = (ret.where(F.col("k") == 0)
            .select("cohort", F.col("n_users").alias("cohort_size")))
    return (ret.join(size, "cohort")
            .select(F.col("cohort").alias("cohort_period"), "k",
                    "n_users", "cohort_size",
                    F.expr(f"n_users * {scale} div cohort_size")
                    .cast("long").alias("retained_scaled")))


def user_sketches(events: DataFrame,
                  by: tuple[str, ...] = ("event_type",),
                  lg_k: int = 14) -> DataFrame:
    """Mergeable distinct-user sketches per group: Spark's native
    Apache DataSketches HLL aggregate (JVM-side, no Python). The
    binary ``user_sketch`` column is the point — stored per group it
    lets ANY later rollup (:func:`sketch_union`) combine distinct
    counts WITHOUT rescanning raw events, which is what makes
    distinct-user reporting tractable at 100 TB (exact countDistinct
    cannot merge across groups; sketches can).

    Output: (*by, n_events, user_sketch binary, est_users). At low
    cardinality (< ~thousands per group at lg_k=14) the sketch is in
    exact "coupon" mode and est_users equals the true count; beyond
    that the standard HLL ~1-2% relative error applies (pinned in
    tests).
    """
    return (events.groupBy(*by).agg(
        F.count("*").alias("n_events"),
        F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("user_sketch"))
        .withColumn("est_users",
                    F.hll_sketch_estimate("user_sketch")))


def sketch_union(sketches: DataFrame,
                 by: tuple[str, ...] = ()) -> DataFrame:
    """Roll stored sketches up a hierarchy (drop grouping columns)
    without touching raw events: one tiny aggregation over the sketch
    table. ``by=()`` yields the single global row.

    Output: (*by, n_events, user_sketch, est_users).
    """
    agg = [F.sum("n_events").alias("n_events"),
           F.hll_union_agg("user_sketch").alias("user_sketch")]
    g = sketches.groupBy(*by).agg(*agg) if by else sketches.agg(*agg)
    return g.withColumn("est_users",
                        F.hll_sketch_estimate("user_sketch"))


def event_windows(events: DataFrame,
                  window_us: int = 3600 * 1_000_000,
                  scale: int = 1_000) -> DataFrame:
    """Batch twin of ``streaming.refresh.windowed_event_counts``:
    tumbling event-time windows per event type, with the value sum
    integer-scaled (``floor(value*scale)`` per row) so the aggregate is
    order-independent and oracle-exact. One shuffle keyed by
    (window, event_type) with map-side combine.

    Output: (window_start epoch-micros, event_type, n,
    value_milli)."""
    ev = events.select(
        "event_type",
        F.expr(TS_US_SPARK).cast("long").alias("tus"),
        F.floor(F.col("value") * scale).cast("long").alias("vm"))
    win = (F.expr(f"tus div {window_us}") * window_us).cast("long")
    return (ev.groupBy(win.alias("window_start"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("vm").alias("value_milli")))


def attribute_conversions(events: DataFrame,
                          conversion: str = "purchase",
                          touches: tuple[str, ...] = ("click", "view"),
                          window_us: int = 7 * 86400 * 1_000_000
                          ) -> DataFrame:
    """Last-touch attribution: each conversion event is credited to the
    LATEST qualifying touch event by the same user within the
    attribution window (ties break on event_id — deterministic).
    Conversions with no qualifying touch stay in the output with null
    touch columns ("unattributed").

    Scale: one user-keyed equi-join between the conversion and touch
    event subsets (both filtered before the join, so shuffle volume is
    the two subsets, not the stream), then a per-conversion window
    rank — partitioned by conversion id, so the sort is bounded by one
    conversion's candidate touches, never global.

    Output: (conversion_id, user_id, conv_tus, touch_id, touch_type,
    touch_tus, lag_us).
    """
    ev = events.select(
        "user_id", "event_type", "event_id",
        F.expr(TS_US_SPARK).cast("long").alias("tus"))
    conv = (ev.where(F.col("event_type") == conversion)
            .select("user_id", F.col("event_id").alias("conversion_id"),
                    F.col("tus").alias("conv_tus")))
    touch = (ev.where(F.col("event_type").isin(list(touches)))
             .select("user_id", F.col("event_id").alias("touch_id"),
                     F.col("event_type").alias("touch_type"),
                     F.col("tus").alias("touch_tus")))
    j = (conv.join(touch, "user_id", "left")
         .where(F.col("touch_tus").isNull()
                | ((F.col("touch_tus") <= F.col("conv_tus"))
                   & (F.col("conv_tus") - F.col("touch_tus")
                      <= window_us))))
    w = Window.partitionBy("conversion_id").orderBy(
        F.desc_nulls_last("touch_tus"), F.desc_nulls_last("touch_id"))
    ranked = j.withColumn("rk", F.row_number().over(w)).where("rk = 1")
    # a conversion whose only join rows were disqualified disappears
    # from `ranked`; restore it as unattributed via the left join below
    return (conv.join(
        ranked.select("conversion_id", "touch_id", "touch_type",
                      "touch_tus"), "conversion_id", "left")
        .select("conversion_id", "user_id", "conv_tus", "touch_id",
                "touch_type", "touch_tus",
                (F.col("conv_tus") - F.col("touch_tus")).alias("lag_us")))


def time_gapfill(events: DataFrame, bucket_s: int = 3600,
                 key_col: str = "user_id") -> DataFrame:
    """Regular-grid resample with gap fill + LOCF — the
    TimescaleDB ``time_bucket_gapfill`` / ``locf`` operator family:
    per key, events are bucketed onto a fixed time grid, EVERY bucket
    between the key's first and last activity appears in the output
    (gap buckets with ``n_events = 0``), and ``last_eid`` carries the
    latest event id forward across gaps (last-observation-carried-
    forward). Integer-only outputs so the cross-engine gate is
    hash-exact (no float sum ordering).

    Plan shape: one groupBy on (key, bucket); the per-key grid comes
    from ``sequence`` + ``explode`` over the key's (min, max) bucket
    span — rows generated ∝ time-span/bucket per key, never a global
    calendar cross join; one (key, bucket) left join back; one
    per-key window for the fill. Keys with pathological spans should
    be range-capped upstream (a key spanning years at 1-second
    buckets explodes to millions of rows — that is the operator's
    honest cost on any engine).

    Output: (key, bucket, n_events, last_eid), bucket = floor(epoch
    micros / bucket). Anchor: epoch, like date_bin's default origin.
    """
    us = bucket_s * 1_000_000
    # floor division in PURE integer arithmetic: `div` truncates
    # toward zero, so pre-epoch (negative) micros get an explicit -1
    # floor correction — the same shape as the DuckDB twin. Spark's
    # `/` is double division (floor(a/b) is only float-exact while
    # micros stay below 2^53), so the integer path keeps the
    # "hash-exact on any epoch" claim unconditional.
    q = F.expr(f"CAST({TS_US_SPARK} AS LONG) div {us}")
    r = F.expr(f"CAST({TS_US_SPARK} AS LONG) % {us}")
    ev = events.select(
        F.col(key_col).alias("key"), "event_id",
        (q - F.when(r < 0, F.lit(1)).otherwise(F.lit(0)))
        .cast("long").alias("bucket"))
    agg = (ev.groupBy("key", "bucket")
           .agg(F.count("*").alias("n_events"),
                F.max("event_id").alias("max_eid")))
    grid = (agg.groupBy("key")
            .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
            .select("key", F.explode(
                F.sequence("mn", "mx")).alias("bucket")))
    j = grid.join(agg, ["key", "bucket"], "left")
    w = (Window.partitionBy("key").orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (j.select(
        "key", "bucket",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.last("max_eid", ignorenulls=True).over(w).alias("last_eid")))


def time_gapfill_select(bucket_s: int = 3600,
                        key_col: str = "user_id") -> str:
    """DuckDB twin of :func:`time_gapfill` over the events table."""
    us = bucket_s * 1_000_000
    return f"""WITH ev AS (
  SELECT {key_col} AS key, event_id,
         (epoch_us(ts) // {us})
           - CASE WHEN epoch_us(ts) < 0 AND epoch_us(ts) % {us} <> 0
                  THEN 1 ELSE 0 END AS bucket
  FROM events),
agg AS (SELECT key, bucket, count(*) AS n_events,
               max(event_id) AS max_eid
        FROM ev GROUP BY 1, 2),
rng AS (SELECT key, min(bucket) AS mn, max(bucket) AS mx
        FROM agg GROUP BY 1),
grid AS (SELECT key, unnest(generate_series(mn, mx)) AS bucket
         FROM rng),
j AS (SELECT g.key, g.bucket,
             COALESCE(a.n_events, 0) AS n_events, a.max_eid
      FROM grid g LEFT JOIN agg a
        ON g.key = a.key AND g.bucket = a.bucket)
SELECT key, CAST(bucket AS BIGINT) AS bucket,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(last_value(max_eid IGNORE NULLS) OVER (
         PARTITION BY key ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS last_eid
FROM j"""


def rolling_active_users(events: DataFrame, window_days: int = 7,
                         day_us: int = 86_400_000_000) -> DataFrame:
    """Rolling distinct-actives (DAU -> WAU/MAU) by SKETCH REUSE: the
    per-day HLL sketches are built ONCE from raw events, then every
    rolling window is a union of ``window_days`` sketch rows — a
    days x window_days self-join over a tiny sketch table instead of
    re-scanning the event stream per window, which is the whole reason
    to store mergeable sketches at 100 TB.

    Output: (day, window_days, est_active) — one row per day with at
    least one event in its trailing window; ``day`` is the epoch-day
    index of the window END. Estimates are exact while per-window
    cardinality stays in the sketch's coupon range (gate regime),
    ~1-2% beyond.
    """
    daily = (events.select(
        F.expr(f"({TS_US_SPARK}) div {day_us}").cast("long").alias("day"),
        "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")))
    # each day's sketch contributes to the window_days windows ending
    # at day .. day+window_days-1: explode to those end days and
    # equi-aggregate — never a theta join (a BETWEEN predicate here
    # plans as BroadcastNestedLoopJoin, O(#days^2) comparisons)
    spans = daily.select(
        F.explode(F.sequence(
            F.col("day"),
            F.col("day") + F.lit(window_days - 1))).alias("end_day"),
        "sk")
    win = spans.groupBy("end_day").agg(F.hll_union_agg("sk").alias("u"))
    # keep only end days that actually saw events (original contract)
    ends = daily.select(F.col("day").alias("end_day"))
    win = win.join(ends, "end_day", "left_semi")
    return (win.select(F.col("end_day").alias("day"),
                       F.lit(window_days).alias("window_days"),
                       F.hll_sketch_estimate("u").cast("long")
                       .alias("est_active")))


def asof_join(left: DataFrame, right: DataFrame,
              on: str = "user_id", ts_col: str = "tus",
              right_cols: tuple[str, ...] = (),
              tolerance_us: int | None = None,
              suffix: str = "_asof") -> DataFrame:
    """Backward as-of join — the time-series operator Spark's join
    family lacks: every left row picks up the LATEST right row with
    ``right.ts <= left.ts`` per key (optionally within
    ``tolerance_us``). Kdb/pandas ``merge_asof`` semantics, ties on
    equal timestamps resolve to the right row (right sorts first).

    Implementation is the scalable union-and-window form, NOT a range
    join: both inputs union into one stream tagged by side, one window
    per key ordered by (ts, side) carries the last non-null right
    attributes forward (``last(..., ignorenulls=True)``), then left
    rows are filtered back out. ONE shuffle keyed by ``on``; per-key
    sort only; no candidate-pair explosion however dense the right
    side is (a range join would be O(left x right) per key).

    Output: left columns + ``<ts_col><suffix>`` (matched right
    timestamp, null if none) + each requested right column as
    ``<col><suffix>``. ``ts_col`` must be numeric (epoch micros; cast
    timestamps with TS_US_SPARK upstream).

    Plan hygiene: each side is built in ONE ``select`` — a per-column
    ``withColumn`` loop nests O(cols) projections into the logical
    plan, which makes analysis itself quadratic on wide tables.
    """
    rc = list(right_cols)
    ldt, rdt = dict(left.dtypes), dict(right.dtypes)
    reserved = {"_side", "_rts", "_m_ts",
                *(f"_r_{c}" for c in rc), *(f"_m_{c}" for c in rc)}
    clash = reserved & (set(left.columns) | set(rc) | {on, ts_col})
    if clash:
        raise ValueError(
            f"asof_join reserves column names {sorted(clash)}; rename "
            "them on the inputs first")
    l2 = left.select(
        "*", F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_rts"),
        *[F.lit(None).cast(rdt[c]).alias(f"_r_{c}") for c in rc])
    r2 = right.select(
        on, F.col(ts_col),
        F.lit(0).alias("_side"),
        F.col(ts_col).cast("long").alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in rc])
    missing = [c for c in l2.columns if c not in r2.columns]
    r2 = r2.select(
        "*", *[F.lit(None).cast(ldt[c]).alias(c) for c in missing])
    u = l2.unionByName(r2.select(l2.columns))
    w = (Window.partitionBy(on).orderBy(ts_col, "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = [F.last("_rts", ignorenulls=True).over(w).alias("_m_ts")]
    carried += [F.last(f"_r_{c}", ignorenulls=True).over(w)
                .alias(f"_m_{c}") for c in rc]
    out = (u.select("*", *carried).where(F.col("_side") == 1))
    ok = F.col("_m_ts").isNotNull()
    if tolerance_us is not None:
        ok = ok & (F.col(ts_col).cast("long") - F.col("_m_ts")
                   <= tolerance_us)
    sel = [c for c in left.columns]
    out = out.select(
        *sel,
        F.when(ok, F.col("_m_ts")).alias(f"{ts_col}{suffix}"),
        *[F.when(ok, F.col(f"_m_{c}")).alias(f"{c}{suffix}")
          for c in rc])
    return out


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str, start_col: str, end_col: str,
               on: tuple[str, ...] = (), bucket: int = 3600_000_000
               ) -> DataFrame:
    """Point-in-interval range join — the other join Spark's equi-only
    planner degrades on (a raw ``BETWEEN`` predicate plans as a
    broadcast nested loop or cartesian): bucket the value axis, explode
    each interval to the buckets it spans, equi-join on
    (``on`` keys + bucket), then apply the exact BETWEEN filter.

    Shuffle volume is O(points + interval-spans) on a real key — never
    a cartesian; per-interval fan-out is ``len/bucket + 1`` rows, so
    pick ``bucket`` near the typical interval length (the standard
    banding trade-off). Matches every (point, interval) pair whose
    keys agree and ``start <= point <= end``.

    Output: all point columns + all interval columns (key columns
    once).
    """
    pts = points.withColumn("_b", F.expr(f"{point_col} div {bucket}"))
    ivs = (intervals.withColumn(
        "_b", F.explode(F.sequence(
            F.expr(f"{start_col} div {bucket}"),
            F.expr(f"{end_col} div {bucket}")))))
    j = pts.join(ivs, [*on, "_b"]).where(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col)))
    # a (point, interval) pair can meet in several buckets only if the
    # point sits in exactly one bucket — it does — so no dedup needed
    return j.drop("_b")


def event_anomalies(events: DataFrame, baseline_days: int = 7,
                    ratio_threshold: float = 2.0,
                    min_baseline_days: int = 3,
                    scale: int = 1_000_000,
                    day_us: int = 86_400_000_000) -> DataFrame:
    """Day-over-day volume anomaly detection per event type: each
    day's count against its trailing ``baseline_days`` average
    (current day EXCLUDED), flagged when the ratio clears
    ``ratio_threshold`` with at least ``min_baseline_days`` of
    baseline. All arithmetic is integer (counts, integer-scaled
    ratio), so the verdicts are exact in any engine — no floating
    z-scores.

    Scale: one (event_type, day) aggregation, then a per-type RANGE
    window over day indices (gap-aware: missing days contribute
    nothing rather than shifting the frame). Window partitions are
    per event type — tiny — so no skew; the heavy lifting is the
    map-side-combined daily count.

    Output: (event_type, day, n, base_days, base_sum, ratio_scaled,
    anomaly); ratio = floor(n * base_days * scale / base_sum)
    (0 when no baseline).
    """
    daily = (events.select(
        "event_type",
        F.expr(f"({TS_US_SPARK}) div {day_us}").cast("long").alias("day"))
        .groupBy("event_type", "day").agg(F.count("*").alias("n")))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rangeBetween(-baseline_days, -1))
    base_sum = F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long")
    base_days = F.count("n").over(w).cast("long")
    cut = int(ratio_threshold * scale)
    out = daily.select(
        "event_type", "day", "n",
        base_days.alias("base_days"), base_sum.alias("base_sum"))
    ratio = F.when(F.col("base_sum") > 0,
                   F.expr(f"(n * base_days * {scale}) div base_sum")) \
        .otherwise(F.lit(0)).cast("long")
    return out.select(
        "event_type", "day", "n", "base_days", "base_sum",
        ratio.alias("ratio_scaled"),
        ((F.col("base_days") >= min_baseline_days)
         & (ratio >= cut)).alias("anomaly"))


# -- count-min sketch (frequency estimation at stream scale) ------------

CMS_SEED = 77


def _cms_bucket_cols(key_col: str, width: int, depth: int,
                     seed: int = CMS_SEED) -> list:
    """One bucket Column per sketch row: ``((k % P) * a_d + b_d) % P
    % width`` — the universal-hash family shared (same constants, same
    fold) with the oracle SQL generator. All intermediates < 2^62:
    int64/BIGINT-exact on both engines."""
    from maps_spark.operators.dedup import P31, minhash_perm_consts
    a, b = minhash_perm_consts(depth, CMS_SEED + seed)
    k = F.col(key_col).cast("long") % P31
    return [(((k * int(a[d]) + int(b[d])) % P31) % width)
            .cast("int").alias(f"b{d}") for d in range(depth)]


def kmv_sketch(events: DataFrame, group_col: str = "event_type",
               value_col: str = "user_id", k: int = 64) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct sketch per group —
    the set-OPERATION sketch HLL lacks: two KMV sets intersect and
    union meaningfully (Beyer et al. 2007), so segment-overlap
    questions ("how many users did both A and B?") stay sketch-sized.

    Per group keeps the k smallest mixed hashes of the distinct
    values. Estimate: exact count when the group has < k distinct
    values, else ``(k - 1) * p div theta`` with theta = the k-th
    minimum — pure integer arithmetic, so the gate hash-matches
    bitwise. Plan: one distinct (group, h) shuffle + one per-group
    window rank (the rank sorts each group once — the standard
    bottom-k shape; the mixed hash is uniform so no value skew).

    Output: (group, theta, n_kept, est_distinct)."""
    from maps_spark.operators.corpus import _mix
    from maps_spark.operators.dedup import P31
    h = _mix(F.col(value_col).cast("long") % P31)
    d = (events.select(F.col(group_col).alias("group"),
                       h.alias("h")).distinct())
    w = Window.partitionBy("group").orderBy("h")
    ranked = d.withColumn("rn", F.row_number().over(w))
    sk = ranked.where(F.col("rn") <= k)
    agg = sk.groupBy("group").agg(
        F.max("h").alias("theta"),
        F.count("*").cast("long").alias("n_kept"))
    est = (F.when(F.col("n_kept") < k, F.col("n_kept"))
           .otherwise(F.expr(f"({k} - 1) * {P31}L div theta")))
    return agg.select("group", "theta", "n_kept",
                      est.cast("long").alias("est_distinct"))


def kmv_overlap(events: DataFrame, group_col: str = "event_type",
                value_col: str = "user_id", k: int = 64) -> DataFrame:
    """Pairwise set-overlap estimates between groups from their KMV
    sketches: for each group pair, merge the two bottom-k sets, keep
    the k smallest of the union, and count how many of those appear
    in BOTH sketches — ``matches div k`` estimates Jaccard, and
    ``matches * union_est div k`` the intersection cardinality
    (integer numerators published; consumers divide).

    Cost is sketch-sized: the pair join runs over k-row sketches per
    group (groups x k rows total), never over the raw values.
    Output: (group_a, group_b, matches, union_theta, union_est)."""
    from maps_spark.operators.corpus import _mix
    from maps_spark.operators.dedup import P31
    h = _mix(F.col(value_col).cast("long") % P31)
    d = (events.select(F.col(group_col).alias("group"),
                       h.alias("h")).distinct())
    w = Window.partitionBy("group").orderBy("h")
    sk = (d.withColumn("rn", F.row_number().over(w))
          .where(F.col("rn") <= k).select("group", "h")
          .localCheckpoint())
    groups = sk.select("group").distinct()
    pairs = (groups.select(F.col("group").alias("ga"))
             .crossJoin(groups.select(F.col("group").alias("gb")))
             .where(F.col("ga") < F.col("gb")))
    # union of the two bottom-k sets per pair, re-ranked, k smallest
    union_rows = (pairs.join(sk, F.col("group") == F.col("ga"))
                  .select("ga", "gb", "h")
                  .unionByName(
                      pairs.join(sk, F.col("group") == F.col("gb"))
                      .select("ga", "gb", "h"))
                  .distinct())
    wu = Window.partitionBy("ga", "gb").orderBy("h")
    topu = (union_rows.withColumn("rn", F.row_number().over(wu))
            .where(F.col("rn") <= k).drop("rn"))
    # membership of each kept union hash in BOTH sketches
    in_a = topu.join(
        sk.select(F.col("group").alias("ga"), "h"), ["ga", "h"],
        "left_semi")
    in_both = in_a.join(
        sk.select(F.col("group").alias("gb"), "h"), ["gb", "h"],
        "left_semi")
    matches = (in_both.groupBy("ga", "gb")
               .agg(F.count("*").cast("long").alias("matches")))
    uni = (topu.groupBy("ga", "gb")
           .agg(F.max("h").alias("union_theta"),
                F.count("*").cast("long").alias("n_u")))
    est = (F.when(F.col("n_u") < k, F.col("n_u"))
           .otherwise(F.expr(f"({k} - 1) * {P31}L div union_theta")))
    return (uni.join(matches, ["ga", "gb"], "left")
            .select(F.col("ga").alias("group_a"),
                    F.col("gb").alias("group_b"),
                    F.coalesce("matches", F.lit(0)).cast("long")
                    .alias("matches"),
                    "union_theta",
                    est.cast("long").alias("union_est")))


def _kmv_sk_cte(group_col: str, value_col: str, k: int) -> str:
    from maps_spark.operators.corpus import mix_sql
    from maps_spark.operators.dedup import P31
    h = mix_sql(f"CAST({value_col} AS BIGINT) % {P31}")
    return f"""d AS (SELECT DISTINCT {group_col} AS grp, {h} AS h
       FROM events),
sk AS (SELECT grp, h FROM (
  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) rn
  FROM d) WHERE rn <= {k})"""


def kmv_sketch_select(group_col: str = "event_type",
                      value_col: str = "user_id",
                      k: int = 64) -> str:
    """DuckDB twin of :func:`kmv_sketch`."""
    from maps_spark.operators.dedup import P31
    return f"""WITH {_kmv_sk_cte(group_col, value_col, k)}
SELECT grp AS "group", theta, CAST(n_kept AS BIGINT) AS n_kept,
       CAST(CASE WHEN n_kept < {k} THEN n_kept
            ELSE CAST({k} - 1 AS BIGINT) * {P31} // theta END AS BIGINT)
         AS est_distinct
FROM (SELECT grp, max(h) AS theta, count(*) AS n_kept
      FROM sk GROUP BY 1)"""


def kmv_overlap_select(group_col: str = "event_type",
                       value_col: str = "user_id",
                       k: int = 64) -> str:
    """DuckDB twin of :func:`kmv_overlap`."""
    from maps_spark.operators.dedup import P31
    return f"""WITH {_kmv_sk_cte(group_col, value_col, k)},
pairs AS (SELECT a.grp AS ga, b.grp AS gb
          FROM (SELECT DISTINCT grp FROM sk) a
          JOIN (SELECT DISTINCT grp FROM sk) b ON a.grp < b.grp),
u AS (SELECT DISTINCT ga, gb, h FROM (
  SELECT p.ga, p.gb, s.h FROM pairs p JOIN sk s ON s.grp = p.ga
  UNION ALL
  SELECT p.ga, p.gb, s.h FROM pairs p JOIN sk s ON s.grp = p.gb)),
topu AS (SELECT ga, gb, h FROM (
  SELECT ga, gb, h,
         row_number() OVER (PARTITION BY ga, gb ORDER BY h) rn
  FROM u) WHERE rn <= {k}),
m AS (SELECT t.ga, t.gb, count(*) AS matches FROM topu t
      WHERE EXISTS (SELECT 1 FROM sk s
                    WHERE s.grp = t.ga AND s.h = t.h)
        AND EXISTS (SELECT 1 FROM sk s
                    WHERE s.grp = t.gb AND s.h = t.h)
      GROUP BY 1, 2),
uni AS (SELECT ga, gb, max(h) AS union_theta, count(*) AS n_u
        FROM topu GROUP BY 1, 2)
SELECT uni.ga AS group_a, uni.gb AS group_b,
       CAST(COALESCE(m.matches, 0) AS BIGINT) AS matches,
       union_theta,
       CAST(CASE WHEN n_u < {k} THEN n_u
            ELSE CAST({k} - 1 AS BIGINT) * {P31} // union_theta END AS BIGINT)
         AS union_est
FROM uni LEFT JOIN m ON uni.ga = m.ga AND uni.gb = m.gb"""


def cms_build(events: DataFrame, key_col: str = "user_id",
              width: int = 1024, depth: int = 4,
              seed: int = CMS_SEED) -> DataFrame:
    """Mergeable count-min sketch (Cormode & Muthukrishnan 2005) over
    ``key_col``: a depth x width counter table answering "how often
    did key k occur" within additive error n/width (overestimates
    only, never under) — the frequency-estimation sibling of the HLL
    distinct sketches above. Store it per partition/day and
    :func:`cms_merge` rolls it up WITHOUT rescanning events; at
    100 TB that is the difference between a counter table of
    ``depth x width`` rows and an exact per-key count of billions.

    One pass: each row explodes to its ``depth`` (row, bucket) cells
    (array + posexplode, pure codegen) and a map-side-combined count
    collapses to at most ``depth * width`` groups before the shuffle.

    Output: (d, bucket, cnt).
    """
    cells = F.posexplode(F.array(*_cms_bucket_cols(key_col, width,
                                                   depth, seed)))
    return (events.select(cells.alias("d", "bucket"))
            .groupBy("d", "bucket").agg(F.count("*").alias("cnt")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Exact sketch union: counters are additive, so merging equals
    building over the concatenated input (pinned in tests)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, keys: DataFrame,
                 key_col: str = "user_id", width: int = 1024,
                 depth: int = 4, seed: int = CMS_SEED) -> DataFrame:
    """Point estimates: min over rows of the key's counter (0 when a
    bucket is absent — an absent counter means no key hashed there).
    Estimates NEVER undercount; planted heavy hitters test exactness.

    Output: (key, est) with ``key`` the key column's value.
    """
    probes = (keys.select(F.col(key_col).alias("key"))
              .distinct()
              .select("key", F.posexplode(F.array(*_cms_bucket_cols(
                  "key", width, depth, seed))).alias("d", "bucket")))
    joined = probes.join(sketch, ["d", "bucket"], "left")
    return (joined.groupBy("key")
            .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long")
                 .alias("est")))


def event_cube(events: DataFrame, scale: int = 1_000) -> DataFrame:
    """Multi-dimensional event rollup via CUBE grouping sets — the
    warehouse-surface "slice by any dimension combination" query
    (event_type x user cohort here), computed in ONE pass: Spark
    expands the grouping sets and map-side-combines each, instead of
    four separate scans. NULL marks a rolled-up dimension, exactly as
    in the SQL-standard CUBE the oracle runs. The value sum is
    integer-scaled per row (floor(value * scale)) so every level is
    order-independent and oracle-exact.

    Output: (event_type, cohort, n, value_milli).
    """
    base = events.select(
        "event_type",
        # plain % (remainder), NOT pmod: the oracle runs SQL-standard
        # user_id % 10, and the two differ on negative keys
        F.expr("CAST(user_id % 10 AS BIGINT)").alias("cohort"),
        F.floor(F.col("value") * scale).cast("long").alias("vm"))
    return (base.cube("event_type", "cohort")
            .agg(F.count("*").alias("n"),
                 F.sum("vm").alias("value_milli")))


# -- mergeable quantile sketch (log2-binned histogram) ------------------

QS_SCALE = 1_000_000   # value -> integer micro-units
QS_SUBS = 32           # sub-buckets per octave -> <=1/32 relative error


def _qs_bin_sql(m: str, subs: int = QS_SUBS) -> str:
    """Dual-dialect bin id for integer ``m``: HdrHistogram-style
    (octave, sub-bucket) packed as ``b * subs + sub`` with
    b = floor(log2(m)) and sub = (m * subs) div 2^b - subs. The
    octave comes from a generated CASE over power-of-two literals —
    never a float log, so Spark and DuckDB bin identically at every
    boundary (a float-log variant flips bins in the last ulp). The
    division is ``floor(x / 2^b)`` on an exactly-representable
    numerator: m is clamped below 2^47, so m * subs < 2^52 < 2^53
    and the double division by a power of two is IEEE-exact in both
    engines. Relative bin width 1/subs; ``m <= 0`` maps to bin -1.
    """
    cap = (1 << 47) - 1
    mc = f"least(({m}), CAST({cap} AS BIGINT))"
    b_case = "(CASE " + " ".join(
        f"WHEN {mc} >= {1 << b} THEN {b}"
        for b in range(46, -1, -1)) + " END)"
    p_case = "(CASE " + " ".join(
        f"WHEN {mc} >= {1 << b} THEN {1 << b}"
        for b in range(46, -1, -1)) + " END)"
    return (f"(CASE WHEN ({m}) <= 0 THEN -1 ELSE "
            f"{b_case} * {subs} + "
            f"CAST(floor(({mc} * {subs}) / {p_case}) AS BIGINT)"
            f" - {subs} END)")


def value_sketch(events: DataFrame, value_col: str = "value",
                 scale: int = QS_SCALE, subs: int = QS_SUBS
                 ) -> DataFrame:
    """Mergeable quantile sketch over a value column: log2-octave /
    linear-sub-bucket histogram (the HdrHistogram / DDSketch family
    from the public literature) with <= 1/subs relative bin width.
    At most ``63 * subs`` bins regardless of data volume, so per-day
    sketches store tiny and merge by counter addition (same property
    as :func:`cms_build`) — distributed quantiles without a global
    sort, and rank queries (:func:`sketch_quantiles`) read the bin
    table only.

    All-integer binning (see :func:`_qs_bin_sql`): both engines place
    every value in the same bin, so the sketch itself is hash-gated.

    Output: (bin, cnt).
    """
    m = f"CAST(floor({value_col} * {scale}) AS BIGINT)"
    return (events.select(F.expr(_qs_bin_sql(m, subs)).alias("bin"))
            .groupBy("bin").agg(F.count("*").alias("cnt")))


def sketch_quantiles(sketch: DataFrame, qs: list[float],
                     scale: int = QS_SCALE, subs: int = QS_SUBS
                     ) -> DataFrame:
    """Rank queries over a :func:`value_sketch`: for each q the first
    bin whose cumulative count reaches ``ceil(q * total)``, reported
    as the bin's integer lower edge in micro-units
    (``2^b * (subs + sub) div subs``) — within one bin width
    (<= 1/subs relative) of the exact quantile, pinned in tests.
    Runs entirely on the tiny bin table: one window cumsum over
    <= 63*subs rows.

    Output: (q_permille, est_scaled).
    """
    from pyspark.sql import Window
    cum = (sketch.withColumn(
        "cum", F.sum("cnt").over(
            Window.orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(F.broadcast(
            sketch.agg(F.sum("cnt").alias("total")))))
    out = None
    for q in qs:
        qpm = int(round(q * 1000))
        tgt = F.expr(f"CAST(ceil(total * {qpm} / 1000.0) AS BIGINT)")
        hit = (cum.where(F.col("cum") >= tgt)
               .orderBy("bin").limit(1)
               .select(F.lit(qpm).alias("q_permille"),
                       F.expr(
                           f"CASE WHEN bin < 0 THEN 0 ELSE "
                           f"(CAST(power(2, bin div {subs}) AS BIGINT)"
                           f" * ({subs} + bin % {subs})) div {subs} "
                           f"END").cast("long").alias("est_scaled")))
        out = hit if out is None else out.unionByName(hit)
    return out


def conversion_latency_sketch(events: DataFrame,
                              conversion: str = "purchase",
                              touches: tuple[str, ...] = ("click",
                                                          "view"),
                              window_us: int = 7 * 86400 * 1_000_000
                              ) -> DataFrame:
    """Time-to-convert distribution at stream scale: the attributed
    touch->conversion lags (:func:`attribute_conversions`) binned into
    the mergeable quantile sketch (:func:`value_sketch`'s integer
    binning applied to the already-integer microsecond lags) — store
    it per day and :func:`sketch_quantiles` answers "p90 time to
    convert" for any date range from counter sums alone, no re-scan
    of events. Unattributed conversions are excluded (they have no
    lag).

    Output: (bin, cnt) — feed to :func:`sketch_quantiles` (estimates
    come back in microseconds).
    """
    att = attribute_conversions(events, conversion, touches, window_us)
    lags = (att.where(F.col("lag_us").isNotNull())
            .select(F.col("lag_us").cast("long").alias("m")))
    return (lags.select(F.expr(_qs_bin_sql("m")).alias("bin"))
            .groupBy("bin").agg(F.count("*").alias("cnt")))


def _sessioned_events(events: DataFrame,
                      gap_us: int = GAP_US_DEFAULT) -> DataFrame:
    """(user_id, sid, tus, event_id, event_type): every event tagged
    with its gap-and-islands session id — the shared front half of
    :func:`sessionize_batch` kept at event grain so path/transition
    analysis can order within the session.

    Scale: identical shuffle profile to sessionize — one hash
    partition on ``user_id``; both windows sort per-user only.
    """
    e = events.select(
        "user_id",
        F.expr(TS_US_SPARK).cast("long").alias("tus"),
        "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    lag = F.lag("tus").over(w)
    brk = F.when(lag.isNull() | ((F.col("tus") - lag) > gap_us),
                 F.lit(1)).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (e.withColumn("brk", brk)
            .withColumn("sid", F.sum("brk").over(run))
            .drop("brk"))


def event_transitions(events: DataFrame,
                      gap_us: int = GAP_US_DEFAULT) -> DataFrame:
    """Markov transition matrix over the event stream: for every
    consecutive pair of events INSIDE one session (never across the
    session gap), count (src -> dst). ``n_src_total`` is the total
    out-degree of ``src`` so a consumer derives the transition
    probability ``n_pairs / n_src_total`` without a second query —
    both columns are exact integers, so the gate hash-matches.

    Product-analytics "path/Sankey" surface; new scope beyond the
    reference (gbif/maps has no event pipeline).

    Scale: one ``user_id`` shuffle feeds both windows (session tag +
    lead); the pair aggregation is map-side combined down to at most
    |event_type|^2 rows, and the out-degree window runs over THAT
    aggregate, not the event stream.
    """
    se = _sessioned_events(events, gap_us)
    ws = Window.partitionBy("user_id", "sid").orderBy("tus", "event_id")
    pairs = (se.withColumn("dst", F.lead("event_type").over(ws))
             .where(F.col("dst").isNotNull())
             .groupBy(F.col("event_type").alias("src"), "dst")
             .agg(F.count("*").alias("n_pairs")))
    wsrc = Window.partitionBy("src")
    return (pairs
            .withColumn("n_src_total", F.sum("n_pairs").over(wsrc))
            .select("src", "dst", "n_pairs", "n_src_total"))


def session_paths(events: DataFrame, gap_us: int = GAP_US_DEFAULT,
                  max_len: int = 8, k: int = 50) -> DataFrame:
    """Top-k session paths: each session becomes the ``'>'``-joined
    sequence of its first ``max_len`` event types (deterministic
    order: ``(tus, event_id)``), and the k most common paths are
    returned with exact counts. Tie-break at the cut is (count desc,
    path asc) so the limit is deterministic in both engines.

    Scale: the path string is built by ``array_sort(collect_list)``
    per session — bounded by one session's events, and ``slice`` caps
    the carried payload at ``max_len`` entries; the path histogram is
    a map-side-combined agg over one row per session, and the top-k
    cut is a TakeOrdered over path-distinct rows, never a global sort
    of sessions.
    """
    se = _sessioned_events(events, gap_us)
    path = F.array_join(
        F.slice(F.transform(
            F.array_sort(F.collect_list(
                F.struct("tus", "event_id", "event_type"))),
            lambda s: s["event_type"]), 1, max_len), ">")
    per_session = (se.groupBy("user_id", "sid")
                   .agg(path.alias("path")))
    return (per_session.groupBy("path")
            .agg(F.count("*").alias("n_sessions"))
            .orderBy(F.desc("n_sessions"), "path")
            .limit(k))
