"""Custom stateful streaming operator: per-key violation streak alarm.

Demonstrates the engine's custom-stateful path
(``applyInPandasWithState``): track, per key (e.g. user_id, producer,
camera), the running streak of rows that violate the bound schema; emit
an alarm row whenever the streak crosses a threshold. The sort of
operator the reference's per-row hooks can't express (cross-row state)
and stock Spark aggregations can't either (ordered, resettable streak).

State = (streak:int, total_bad:int) per key; timeouts drop idle keys.
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..binding import bind
from ..schema import Schema

ALARM_DDL = "key string, streak int, total_bad bigint, event_count bigint"
_STATE_DDL = "streak int, total_bad long"


def violation_streaks(
    schema: Schema,
    stream_df,
    *,
    key_col: str,
    ts_col: str,
    row_key: str,
    streak_threshold: int = 3,
    **bind_opts,
):
    """Streaming DataFrame of alarm rows (key, streak, total_bad,
    event_count), one per micro-batch per key whose violation streak is
    ≥ threshold. The bound constraint plan marks rows bad; state keeps
    the streak across batches."""
    from pyspark.sql import functions as F

    flagged = bind(
        schema,
        stream_df,
        row_key=row_key,
        keep_cols=[key_col, ts_col],
        **bind_opts,
    ).flagged
    marked = flagged.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("ts"),
        (F.size("__errs") > 0).alias("bad"),
    )

    def update(
        key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ):
        streak, total_bad = state.get if state.exists else (0, 0)
        peak = streak  # alarm on the PEAK streak seen, not end-of-batch
        n = 0
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for bad in pdf["bad"]:
                n += 1
                if bad:
                    streak += 1
                    total_bad += 1
                    peak = max(peak, streak)
                else:
                    streak = 0
        state.update((int(streak), int(total_bad)))
        if peak >= streak_threshold:
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "streak": [int(peak)],
                    "total_bad": [int(total_bad)],
                    "event_count": [n],
                }
            )

    return marked.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=ALARM_DDL,
        stateStructType=_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
