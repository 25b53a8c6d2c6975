"""datafusion_randgen_spark — a PySpark-native rebuild of
``corasaurus-hex/datafusion-randgen`` plus a Spark-first synthetic-data /
LLM-data-pipeline toolkit.

The reference is a random-data-generation extension for Apache DataFusion:
one volatile, vectorized scalar UDF ``randgen_int64_uniform(min, max)``
registered into a ``SessionContext`` (reference ``src/lib.rs:8-10``,
``src/randgen/int64_uniform.rs:17-93``).  This package reproduces that
surface on Spark — ``add_udfs(spark)`` mirrors ``add_udfs(&mut ctx)`` —
and extends it into a full generator family, deterministic (seeded)
JVM-side generators, and large-scale pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Design notes (Spark-first, not a port):

* Generators come in two flavors per distribution:

  - **parity UDFs** (``functions.randgen``): Arrow-vectorized pandas UDFs
    with the reference's exact semantics — inclusive bounds, SQL NULL
    propagation, error on ``min > max`` — registered under the reference
    names so ``spark.sql("SELECT randgen_int64_uniform(1, 10) ...")``
    works verbatim.  This is the moral equivalent of the reference's
    per-batch Arrow kernels (``int64_uniform.rs:106-153``).
  - **expression fast paths** (``functions.exprs``): pure Catalyst
    ``Column`` builders (``F.rand()`` based) that stay inside
    whole-stage codegen — the 100 TB path, no Python worker round-trip.

* Everything downstream is plain ``DataFrame`` ops; Catalyst handles
  pushdown/pruning/broadcast.  RDDs are never used.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__version__ = "0.1.0"


def add_udfs(spark: SparkSession) -> None:
    """Register every randgen UDF into ``spark``'s function registry.

    Mirrors the reference entry point ``add_udfs(&mut SessionContext)``
    (``src/lib.rs:8-10``): pure catalog mutation, no execution.
    """
    from datafusion_randgen_spark.functions.exprs import register_sql_fastpaths
    from datafusion_randgen_spark.functions.randgen import register_parity_udfs
    from datafusion_randgen_spark.functions.udaf import register_udafs
    from datafusion_randgen_spark.functions.udtf import register_udtfs
    from datafusion_randgen_spark.sources.python_datasource import register_datasources

    register_parity_udfs(spark)
    register_sql_fastpaths(spark)
    register_udtfs(spark)
    register_udafs(spark)
    register_datasources(spark)


__all__ = ["add_udfs", "__version__"]
