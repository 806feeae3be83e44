"""Runtime: per-partition lineage/checkpoint, resumable runs, counters."""
