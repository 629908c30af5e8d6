"""Custom stateful streaming operator: user sessionization via
applyInPandasWithState (the Structured Streaming analog of the batch
`user_sessions` parity query — gap > 30 min starts a new session).

State per user: (last event time in epoch-us, session count, event count).
Within a micro-batch, events are sorted by timestamp before folding, so a
Trigger.AvailableNow run over a static table is EXACTLY the batch
lag/cumsum computation (asserted in tests).  Across micro-batches the fold
assumes per-user batch arrival in event-time order (the standard
monotone-source assumption; a watermark + delayed emission would lift it at
the cost of latency — out of scope here, documented).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

SESSION_GAP_SEC = 1800


def sessionize_stream(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """events: streaming DataFrame with (user_id long, ts timestamp, ...).
    Emits (user_id, n_sessions, n_events) updates per micro-batch."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_sec * 1_000_000

    def fold(key, pdfs, state):
        if state.exists:
            last_us, n_sessions, n_events = state.get
        else:
            last_us, n_sessions, n_events = -1, 0, 0
        parts = [pdf["ts"] for pdf in pdfs]
        us = np.sort(
            np.concatenate([p.values.astype("datetime64[us]").astype(np.int64)
                            for p in parts])
        )
        for t in us:
            if last_us < 0 or t - last_us > gap_us:
                n_sessions += 1
            last_us = int(t)
            n_events += 1
        state.update((last_us, n_sessions, n_events))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_sessions": n_sessions,
              "n_events": n_events}]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        "user_id long, n_sessions long, n_events long",
        "last_us long, n_sessions long, n_events long",
        "update",
        GroupStateTimeout.NoTimeout,
    )
