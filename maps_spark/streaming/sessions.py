"""Stateful streaming sessionization via ``applyInPandasWithState``.

The streaming twin of :func:`maps_spark.operators.sessions.
sessionize_batch`: open sessions live in the state store keyed by
``user_id``; each micro-batch folds its (in-order) events into the open
session, emits sessions that a gap closed, and arms an event-time
timeout at ``last_event + gap`` so idle sessions close when the
watermark passes them — bounded state, no full-corpus rescan.

This is the pattern for operators Structured Streaming's built-in
windowed aggregations cannot express (the session window here depends
on data-driven gaps, not fixed boundaries). State is four BIGINTs per
active user — at 100 TB scale the state store is O(active users), and
the HDFS/RocksDB state backend shards it by the same ``user_id`` hash
as the shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from maps_spark.operators.sessions import (GAP_US_DEFAULT, SESSION_SCHEMA,
                                           TS_US_SPARK)

_STATE_SCHEMA = "start long, last long, n long, v long"
_OUT_COLS = ["user_id", "session_start", "session_end",
             "n_events", "value_milli"]


def sessionize_stream(spark: SparkSession, input_dir: str,
                      gap_us: int = GAP_US_DEFAULT,
                      watermark: str = "1 minute") -> DataFrame:
    """Streaming per-user sessions over files landing in ``input_dir``.

    Emits one row per CLOSED session (append mode); sessions still open
    when the stream pauses stay in state and are emitted once the
    watermark passes their timeout.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from maps_spark.streaming.refresh import _stream_parquet

    gap_ms = gap_us // 1000

    def fn(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                s, last, n, v = state.get
                closed.append((user_id, s, last, n, v))
                state.remove()
            yield pd.DataFrame(closed, columns=_OUT_COLS)
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.assign(
            vm=np.floor(rows["value"] * 1000).astype("int64"),
        ).sort_values(["tus", "event_id"])
        if state.exists:
            s, last, n, v = state.get
        else:
            s = None
        for tus, vm in zip(rows["tus"].tolist(), rows["vm"].tolist()):
            if s is not None and tus - last > gap_us:
                closed.append((user_id, s, last, n, v))
                s = None
            if s is None:
                s, last, n, v = tus, tus, 1, vm
            else:
                # a late (within-watermark) event from an earlier batch
                # can arrive with tus < last: fold it into the open
                # session WITHOUT regressing `last` (which would break
                # start <= end and re-arm the timeout too early). The
                # batch twin, which sorts globally, is the ground truth
                # for fully out-of-order replays.
                s, last, n, v = min(s, tus), max(last, tus), n + 1, v + vm
        state.update((int(s), int(last), int(n), int(v)))
        # close the open session once the watermark passes last + gap;
        # if that moment already passed, fire on the next trigger
        state.setTimeoutTimestamp(
            max(last // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(closed, columns=_OUT_COLS)

    stream = _stream_parquet(spark, input_dir)
    # epoch micros computed JVM-side (tz-independent) so the Python
    # state fn sees a plain int64, never a pandas datetime dtype
    with_time = (stream
                 .withColumn("tus", F.expr(TS_US_SPARK).cast("long"))
                 .withColumn("event_time", F.timestamp_micros("tus")))
    return (with_time.withWatermark("event_time", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(fn, SESSION_SCHEMA, _STATE_SCHEMA,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))
