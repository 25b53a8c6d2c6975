"""Structured Streaming smoke: randgen columns over the rate source,
watermarked windowed aggregation, session windows — driven synchronously
via the in-memory sink."""

from __future__ import annotations

import pytest
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

        # Poll the sink — do NOT processAllAvailable() on a rate source:
        # it waits for the latest offset, which advances every second, so
        # on a busy JVM (full-suite run) the query never catches up and
        # the call blocks unboundedly.
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
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


def test_stateful_user_totals_stream(spark, tmp_path):
    """applyInPandasWithState: per-user running totals across
    micro-batches must converge to the batch groupBy answer."""
    from datafusion_randgen_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select("user_id", "ts", "value")
    path = str(tmp_path / "ev_stream")
    # two files -> at least two input splits for the file stream
    ev.repartition(2).write.parquet(path)
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(path)
    out = st.stateful_user_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_totals")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # last update per user == batch ground truth
    got = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) AS rk
          FROM user_totals) WHERE rk = 1
        """
    )
    expect = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("total_value")
    )
    diff = got.alias("g").join(expect.alias("e"), "user_id").filter(
        (F.col("g.n_events") != F.col("e.n_events"))
        | (F.abs(F.col("g.total_value") - F.col("e.total_value")) > 1e-6)
    )
    assert expect.count() > 0
    assert got.count() == expect.count()
    assert diff.count() == 0


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream join result must equal the equivalent batch join."""
    from datafusion_randgen_spark.sources import load_table

    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("user_id", "ts", "value")
        .filter(F.col("user_id") < 50)
    )
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    ev.repartition(2).write.parquet(lp)
    ev.repartition(2).write.parquet(rp)
    ls = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(lp)
    rs = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(rp)
    joined = st.stream_stream_interval_join(ls, rs, max_delay="10 minutes")
    q = joined.writeStream.outputMode("append").format("memory").queryName("ssj").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT count(*) AS n FROM ssj").collect()[0].n
    batch = (
        ev.alias("l")
        .join(
            ev.alias("r"),
            F.expr(
                "l.user_id = r.user_id AND r.ts >= l.ts "
                "AND r.ts <= l.ts + INTERVAL 10 minutes"
            ),
        )
        .count()
    )
    assert got == batch > 0


def test_session_windows_batch(spark):
    from datafusion_randgen_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = st.session_windows(ev, gap="30 minutes")
    # session totals must account for every event
    assert out.agg(F.sum("n_events").alias("t")).collect()[0].t == ev.count()


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: every duplicated (user_id, ts) pair
    collapses to one row; count must equal the batch distinct count."""
    from datafusion_randgen_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select("user_id", "ts", "value")
    dup = ev.union(ev)  # exact duplicates of every event
    path = str(tmp_path / "dup_stream")
    dup.repartition(3).write.parquet(path)
    stream = spark.readStream.schema(dup.schema).option("maxFilesPerTrigger", 1).parquet(path)
    # watermark wider than the fixture's one-month ts span: duplicates
    # may land in any micro-batch, so a narrow watermark would
    # nondeterministically late-drop first copies (undercount) or evict
    # state before the second copy (overcount)
    out = st.stream_dedup(stream, keys=["user_id", "ts"], watermark="60 days")
    q = out.writeStream.outputMode("append").format("memory").queryName("dedup_stream").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT count(*) AS n FROM dedup_stream").collect()[0].n
    expect = ev.select("user_id", "ts").distinct().count()
    assert got == expect > 0


def test_python_stream_source_replay_deterministic(spark):
    """(seed, start_row)-keyed generation: two independent runs of the
    bounded stream must produce identical rows — the replayable-source
    / exactly-once contract."""
    from datafusion_randgen_spark import streaming as st

    def run(name):
        stream = (
            spark.readStream.format("randgen")
            .option("rowsPerBatch", 700)
            .option("maxRows", 2100)
            .option("partitions", 3)
            .option("seed", 5)
            .load()
        )
        got = st.run_stream_to_memory(stream, name, spark, mode="append")
        return sorted((r.id, r.x, r.u) for r in got.collect())

    assert run("st_replay_a") == run("st_replay_b")


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Stop/restart with the same checkpoint must process each input
    file exactly once: run 1 sees files 1-2, run 2 (same checkpoint)
    sees 3-4 — the parquet sink must hold every row exactly once."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "in")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "id long, v long"

    def write_file(i):
        spark.createDataFrame(
            [(i * 100 + j, j) for j in range(100)], schema
        ).coalesce(1).write.mode("append").parquet(src)

    def drain():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_file(0)
    write_file(1)
    drain()
    n_after_first = spark.read.parquet(sink).count()
    assert n_after_first == 200
    write_file(2)
    write_file(3)
    drain()
    out = spark.read.parquet(sink)
    assert out.count() == 400  # no re-processing, no loss
    assert out.select(F.countDistinct("id")).first()[0] == 400


def test_foreach_batch_idempotent_sink(spark, tmp_path):
    """foreachBatch: the escape hatch to arbitrary batch sinks.  Writing
    each micro-batch to a batchId-named directory makes the sink
    idempotent under retries (same batch re-runs overwrite the same
    path, never duplicate)."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    schema = "id long, v long"
    spark.createDataFrame(
        [(i, i * 2) for i in range(300)], schema
    ).repartition(3).write.parquet(src)

    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.option("basePath", out).parquet(out)
    assert got.count() == 300
    assert got.select(F.countDistinct("batch")).first()[0] >= 2  # really micro-batched


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401, PLC0415
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs google.protobuf (absent here)",
)
def test_tws_user_totals_matches_batch(spark, tmp_path):
    """State API v2 final per-user ValueState == batch groupBy (runs
    only where protobuf exists — env-gated like the multimodal codec)."""
    import tempfile

    from datafusion_randgen_spark import streaming as st
    from datafusion_randgen_spark.sources import load_table

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
            "user_id", "ts", "value"
        )
        stream = st.file_stream_from(ev, tempfile.mkdtemp(prefix="tws_"))
        out = st.tws_user_totals(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("tws_test_out")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            r.user_id: (r.n_events, round(r.total_value, 3))
            for r in spark.sql(
                "SELECT user_id, max_by(n_events, n_events) AS n_events,"
                " max_by(total_value, n_events) AS total_value"
                " FROM tws_test_out GROUP BY user_id"
            ).collect()
        }
        want = {
            r.user_id: (r.n, round(r.t, 3))
            for r in ev.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("t"))
            .collect()
        }
        assert got == want
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
