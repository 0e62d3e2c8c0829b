"""Custom stateful streaming operators via ``applyInPandasWithState``.

Beyond-reference capability (§2.9): the reference analyzes gaps post-hoc
over the full frame (``load_file.py:2079-2092``); this operator detects
them INCREMENTALLY — per series key, the state holds the last-seen event
time, and a gap record is emitted the moment an event arrives more than
``gap_seconds`` after its predecessor. State is O(1) per key (one
timestamp), so the operator runs indefinitely on unbounded streams.

This is the canonical shape for custom stateful logic the built-in
windowed aggregations can't express (the gap is BETWEEN events, not within
a fixed window).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

GAP_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("gap_start", TimestampType()),
        StructField("gap_end", TimestampType()),
        StructField("gap_seconds", DoubleType()),
    ]
)

STATE_SCHEMA = StructType([StructField("last_ts_micros", LongType())])


def streaming_gap_detector(
    events: DataFrame,
    gap_seconds: float,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Emit (key, gap_start, gap_end, gap_seconds) whenever consecutive
    events of a key are more than ``gap_seconds`` apart.

    Input must be a streaming DataFrame with watermark set by the caller if
    state cleanup on event time is desired; state here is constant-size per
    key so NoTimeout is safe for bounded key cardinality.
    """

    def detect(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if state.exists:
            (last_micros,) = state.get
            last = pd.Timestamp(last_micros, unit="us")
        else:
            last = None
        out = []
        for pdf in pdfs:
            for ts in pdf[ts_col].sort_values():
                if last is not None:
                    delta = (ts - last).total_seconds()
                    if delta > gap_seconds:
                        out.append((uid, last, ts, delta))
                if last is None or ts > last:
                    last = ts
        if last is not None:
            state.update((int(last.value // 1000),))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "gap_start", "gap_end", "gap_seconds"])

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            detect,
            outputStructType=GAP_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
