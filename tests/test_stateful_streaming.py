"""applyInPandasWithState: per-host running QC counters over a stream."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sequali_spark.streaming import stateful
from sequali_spark.streaming import stream as st
from tests.test_pipeline import pages_df


def test_streaming_host_state(spark, pages_tiny, tmp_path):
    src = str(tmp_path / "drops")
    pages_df(spark, pages_tiny, partitions=4).write.parquet(src)

    pages_stream = st.read_pages_stream(spark, src)
    labels = st.streaming_labels(
        pages_stream, output_columns=["url", "keep", "n_bytes"]
    )
    hosts = stateful.streaming_host_state(labels)
    q = (
        hosts.writeStream.format("memory")
        .queryName("host_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "select host, max(docs) docs, max(kept) kept from host_state group by host"
    ).toPandas()

    # truth from the batch oracle
    from sequali_spark.oracle import oracle_metrics

    m = oracle_metrics(pages_tiny)
    m["host"] = [u.split("/")[2] for u in m["url"]]
    want = (
        m.groupby("host")
        .agg(docs=("keep", "size"), kept=("keep", "sum"))
        .reset_index()
    )
    merged = got.merge(want, on="host", suffixes=("_got", "_want"))
    assert len(merged) == len(want)
    assert (merged["docs_got"] == merged["docs_want"]).all()
    assert (merged["kept_got"] == merged["kept_want"].astype(int)).all()
