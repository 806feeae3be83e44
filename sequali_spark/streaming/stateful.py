"""Custom stateful streaming operator: per-host running QC state.

sequali's modules are exactly this shape — bounded per-key state updated
record-at-a-time with a finalize view (reference: the add_record_array /
finalize trio, _qc.pyi:73-188).  In Structured Streaming the same shape
is ``applyInPandasWithState``: state = per-host running counters
(docs, kept, bytes, last_seen), updated per micro-batch, emitted on
every update, timed out after inactivity (GroupStateTimeout) — the
always-on version of the per-host report (A7/A19).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "docs long, kept long, bytes long"
OUTPUT_SCHEMA = "host string, docs long, kept long, bytes long"


def _update_host_state(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State update kernel: fold this micro-batch's rows for one host
    into the running counters (the add_record_array analogue)."""
    if state.hasTimedOut:  # idle host: emit final counters, evict state
        (docs, kept, nbytes) = state.get
        state.remove()
        yield pd.DataFrame(
            {"host": [key[0]], "docs": [docs], "kept": [kept], "bytes": [nbytes]}
        )
        return
    docs, kept, nbytes = state.get if state.exists else (0, 0, 0)
    for pdf in pdf_iter:
        docs += len(pdf)
        kept += int(pdf["keep"].sum())
        nbytes += int(pdf["n_bytes"].sum())
    state.update((docs, kept, nbytes))
    try:
        state.setTimeoutDuration(60 * 60 * 1000)  # finalize idle hosts after 1h
    except Exception:
        pass  # NoTimeout configured (bounded drain)
    yield pd.DataFrame({"host": [key[0]], "docs": [docs], "kept": [kept], "bytes": [nbytes]})


def streaming_host_state(
    labels_stream: DataFrame, idle_timeout: bool = False
) -> DataFrame:
    """labels stream (url, keep, n_bytes, ...) -> running per-host QC
    counters via applyInPandasWithState.  ``idle_timeout`` finalizes and
    evicts hosts idle for 1h (continuous deployments; bounded-drain jobs
    keep NoTimeout so AvailableNow terminates without waiting on the
    processing-time clock)."""
    host = F.parse_url(F.col("url"), F.lit("HOST")).alias("host")
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout if idle_timeout else GroupStateTimeout.NoTimeout
    )
    return (
        labels_stream.select(host, "keep", "n_bytes")
        .groupBy("host")
        .applyInPandasWithState(
            _update_host_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=conf,
        )
    )
