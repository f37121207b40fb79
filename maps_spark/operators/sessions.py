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
