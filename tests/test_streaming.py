"""Structured Streaming smoke: randgen columns over the rate source,
watermarked windowed aggregation, session windows — driven synchronously
via the in-memory sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_randgen_spark import streaming as st


def test_randgen_stream_produces_rows(spark):
    stream = st.randgen_stream(spark, rows_per_second=500)
    assert stream.isStreaming
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("randgen_smoke")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            q.processAllAvailable()
            n = spark.sql("SELECT count(*) AS n FROM randgen_smoke").collect()[0].n
            if n > 0:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert n > 0
    rows = spark.sql(
        "SELECT count_if(user_id BETWEEN 1 AND 1000) AS ok, count(*) AS n, "
        "count_if(event_type IN ('view','click','purchase','signup','error')) AS et "
        "FROM randgen_smoke"
    ).collect()[0]
    assert rows.ok == rows.n == rows.et


def test_windowed_counts_batch_equivalence(spark):
    # batch DF through the same helper used for streams
    from datafusion_randgen_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = st.windowed_counts(ev, window="1 hour")
    total = out.agg(F.sum("n").alias("t")).collect()[0].t
    assert total == ev.count()


def test_windowed_counts_streaming_from_files(spark, tmp_path):
    from datafusion_randgen_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "events_stream")
    ev.write.parquet(path)
    stream = (
        spark.readStream.schema(ev.schema).parquet(path)
    )
    agg = st.windowed_counts(stream, window="1 hour")
    got = st.run_stream_to_memory(agg, "win_counts", spark, mode="complete")
    total = got.agg(F.sum("n").alias("t")).collect()[0].t
    assert total == ev.count()


def test_session_windows_batch(spark):
    from datafusion_randgen_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = st.session_windows(ev, gap="30 minutes")
    # session totals must account for every event
    assert out.agg(F.sum("n_events").alias("t")).collect()[0].t == ev.count()
