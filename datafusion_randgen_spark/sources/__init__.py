"""Sources: the row-generating sequence source the reference queries use,
parquet fixture loading, and synthetic-table writers."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def generate_series(spark: SparkSession, start: int, end: int, num_partitions: int | None = None) -> DataFrame:
    """DataFusion's ``generate_series(start, end)`` table function
    (reference test source, ``src/randgen/int64_uniform.rs:170``):
    *inclusive* of ``end`` — Spark's ``range`` is end-exclusive, hence +1.

    ``num_partitions`` is the scale knob: generation is embarrassingly
    parallel, so at cluster scale pass ~2-3× total cores.
    """
    if num_partitions:
        return spark.range(start, end + 1, 1, num_partitions).withColumnRenamed("id", "value")
    return spark.range(start, end + 1).withColumnRenamed("id", "value")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan — columnar, filter/column pushdown handled by Catalyst.

    ``events.ts`` has shipped as either TIMESTAMP(NANOS) — which Spark's
    vectorized parquet reader rejects — or TIMESTAMP(MICROS), depending
    on the fixture generation.  Handle both: with ``nanosAsLong`` set, a
    nanos column surfaces as LongType (convert with integer ``div``, the
    same truncation DuckDB applies); a micros column surfaces as a
    timestamp already (normalize NTZ → session-UTC TimestampType so
    downstream queries see one type either way).
    """
    if name == "events":
        import glob as _glob

        import pyarrow.parquet as _pq
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        path = table_path(sf_dir, name)
        files = _glob.glob(os.path.join(path, "*.parquet")) if os.path.isdir(path) else [path]
        arrow_ts = _pq.read_schema(files[0]).field("ts").type
        if getattr(arrow_ts, "unit", None) == "ns":
            # Only mutate the session conf when the footer really is
            # nanos (the vectorized reader needs it for the whole
            # lifetime of the scan, so it cannot be set-and-restored);
            # a micros fixture leaves the session untouched.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer `div`, NOT floor(x/1000.0): ~1.7e18 ns exceeds double's
            # exact-integer range, and the rounding error shifts ±1µs.
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view named after itself."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
