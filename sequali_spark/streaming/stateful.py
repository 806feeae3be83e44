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


SPIKE_STATE_SCHEMA = "hours array<long>, counts array<long>"
SPIKE_OUTPUT_SCHEMA = (
    "event_type string, hour timestamp, events long, trailing_slots long, "
    "is_spike boolean"
)


def _spike_update_factory(k: int, window: int, min_slots: int):
    """Kernel factory for the streaming spike monitor (closes over the
    detector knobs — applyInPandasWithState's kernel signature is
    fixed).  State per event_type = the trailing closed-hour counts
    (bounded at ``window`` entries); Python big-int arithmetic makes the
    k-sigma decision EXACT and bit-identical to the batch operator's
    decimal math (operators/events.hourly_anomaly):

        (n*x - S)^2 > k^2 * (n*Sq - S^2)
    """
    kk = k * k

    def _update(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        hours, counts = state.get if state.exists else ([], [])
        hours, counts = list(hours), list(counts)
        batch = pd.concat(list(pdf_iter), ignore_index=True)
        if not len(batch):
            return
        # closed windows arrive in watermark order across batches; sort
        # within the batch so the deque stays chronological
        batch = batch.sort_values("hour")
        out = {"event_type": [], "hour": [], "events": [], "trailing_slots": [], "is_spike": []}
        for hour, x in zip(batch["hour"], batch["events"]):
            x = int(x)
            epoch = int(pd.Timestamp(hour).timestamp())
            # ORDERING GUARD: the contract is in-order, exactly-once
            # closed windows (the append-mode rollup guarantees it).  A
            # duplicate or time-regressed window would silently corrupt
            # the trailing frame — emit it UNDECIDED (NULL flag) and
            # leave state untouched instead.
            if hours and epoch <= hours[-1]:
                out["event_type"].append(key[0])
                out["hour"].append(hour)
                out["events"].append(x)
                out["trailing_slots"].append(len(counts))
                out["is_spike"].append(None)
                continue
            n = len(counts)
            if n >= min_slots:
                s = sum(counts)
                sq = sum(v * v for v in counts)
                spike = (n * x - s) ** 2 > kk * (n * sq - s * s)
            else:
                spike = None
            out["event_type"].append(key[0])
            out["hour"].append(hour)
            out["events"].append(x)
            out["trailing_slots"].append(n)
            out["is_spike"].append(spike)
            hours.append(epoch)
            counts.append(x)
            if len(counts) > window:
                hours, counts = hours[-window:], counts[-window:]
        state.update((hours, counts))
        yield pd.DataFrame(out)

    return _update


def streaming_spike_monitor(
    hourly_counts: DataFrame, k: int = 3, window: int = 24, min_slots: int = 12
) -> DataFrame:
    """Always-on ingestion-health monitor: a stream of CLOSED hourly
    windows (event_type, hour, events) -> per-window spike flags against
    the trailing ``window`` hours — the streaming twin of
    operators/events.hourly_anomaly, with the trailing frame held as
    bounded per-key state instead of a window function.

    Production topology is two queries (append-mode watermarked rollup
    -> rollup table -> this monitor), mirroring the batch composition;
    the upstream append mode guarantees each window arrives exactly once
    and (per key) in watermark order."""
    return hourly_counts.groupBy("event_type").applyInPandasWithState(
        _spike_update_factory(k, window, min_slots),
        outputStructType=SPIKE_OUTPUT_SCHEMA,
        stateStructType=SPIKE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_hourly_counts(
    events_stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-hour counts per event type in APPEND mode —
    each (type, hour) emits exactly once, when the watermark closes the
    window; the upstream stage of the spike-monitor topology."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("events"))
        .select("event_type", F.col("w.start").alias("hour"), "events")
    )


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
