"""Structured Streaming forms of the engine's operators.

The batch tag join (tagjoin.tag_tiles_pairs) is map-side only —
pure-SQL encode + broadcast equi-join + SQL refinement — so the SAME
plan runs unchanged on a streaming DataFrame (no stream-stream join,
no global shuffle): ``streaming_tag_pairs`` is the incremental
point-in-tile tagging pipeline (readStream -> tag -> writeStream).

``sessionize_events`` is the custom stateful operator the task brief
calls for: per-key sessionization over event time with
``applyInPandasWithState`` (GroupState + processing-time timeout),
emitting one row per closed session. State is O(open sessions);
events stream through Arrow batches.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .tagjoin import tag_tiles_pairs
from .tiles import TileSetStruct


def streaming_tag_pairs(
    spark: SparkSession,
    stream_df: DataFrame,
    ts: TileSetStruct,
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """The tag join applied to a STREAMING DataFrame.

    Identical plan to the batch path (encode + broadcast covering join
    + SQL refinement are all stateless map-side operators), so
    incremental micro-batches produce exactly the batch answer —
    asserted in tests/test_streaming_ops.py. The exact-residual branch
    requires a second pass and is therefore not available on streams;
    uncertified polygon lanes (organic-data probability ~0) are
    dropped from the certified output, matching the batch
    ``exact_residuals=False`` mode.
    """
    return tag_tiles_pairs(
        spark, stream_df, ts, lat_col, lng_col, exact_residuals=False
    )


_SESSION_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("session_start", DoubleType()),
        StructField("session_end", DoubleType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("session_start", DoubleType()),
        StructField("session_end", DoubleType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def sessionize_events(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    timeout_ms: int = 30_000,
) -> DataFrame:
    """Custom stateful operator: per-event-type sessionization.

    Events (event_type, ts_sec, value) group into sessions separated
    by > ``gap_seconds`` of event-time silence. Implemented with
    ``applyInPandasWithState`` (the brief's custom-stateful-operator
    surface): state holds the open session per key; closed sessions
    are emitted as soon as a later event proves the gap, and the final
    open session flushes on state timeout after the stream goes quiet.

    Works on both streaming (update mode) and batch groupBy inputs.
    """

    def fn(key, pdf_iter, state: GroupState):
        (event_type,) = key
        if state.hasTimedOut:
            if state.exists:
                s0, s1, n, sv = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "event_type": [event_type],
                        "session_start": [s0],
                        "session_end": [s1],
                        "n_events": [n],
                        "sum_value": [sv],
                    }
                )
            return

        if state.exists:
            s0, s1, n, sv = state.get
        else:
            s0 = s1 = None
            n = 0
            sv = 0.0

        out_rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts_sec")
            for t, v in zip(pdf["ts_sec"], pdf["value"]):
                t = float(t)
                v = float(v)
                if s0 is None:
                    s0, s1, n, sv = t, t, 1, v
                elif t - s1 > gap_seconds:
                    out_rows.append((event_type, s0, s1, n, sv))
                    s0, s1, n, sv = t, t, 1, v
                else:
                    s1 = max(s1, t)
                    n += 1
                    sv += v
        state.update((s0, s1, n, sv))
        state.setTimeoutDuration(timeout_ms)
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "event_type", "session_start", "session_end",
                    "n_events", "sum_value",
                ],
            )

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=_SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
