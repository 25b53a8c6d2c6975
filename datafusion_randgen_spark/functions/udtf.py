"""Python UDTF surface — SQL-callable *table* functions.

The reference's query surface leans on DataFusion's ``generate_series``
table function (``/root/reference/src/randgen/int64_uniform.rs:170``:
``FROM generate_series(1, 100)``).  Spark has no user-facing equivalent
of registering a table function short of Scala — except the Python UDTF
API (Spark 3.5+), which is exactly that: a class whose ``eval`` yields
rows, registered into the session catalog and callable in ``FROM``.

Two deliberately different roles:

* ``RandgenSeries`` — **API parity**: ``FROM randgen_series(1, 100)``
  matches DataFusion's inclusive ``generate_series``.  A UDTF with
  literal args runs as a single task, so this is the *compatibility*
  path; the *scale* path for row generation remains
  ``spark.range(n, numPartitions=p)`` (document, don't hide).
* ``RandgenUniformRows`` — a volatile random-row generator as a table
  function: ``FROM randgen_uniform_rows(1000, 1, 10)`` yields
  ``(id, x)`` with ``x ~ U[lo, hi]`` inclusive — the reference's
  flagship one-liner without the ``FROM range`` scaffolding.

Both are partition-local and stateless; at scale they compose with
``LATERAL`` joins so each input row fans out inside its own task.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


class RandgenSeries:
    """Inclusive integer series, DataFusion ``generate_series`` parity."""

    def eval(self, start: int, stop: int, step: int = 1):
        if step == 0:
            raise ValueError("randgen_series: step must not be zero")
        if start is None or stop is None:
            return
        v = start
        if step > 0:
            while v <= stop:
                yield (v,)
                v += step
        else:
            while v >= stop:
                yield (v,)
                v += step


class RandgenUniformRows:
    """``n`` rows of ``(id, x)`` with ``x ~ U[lo, hi]`` inclusive.

    NULL bound -> NULL x (reference null semantics); ``lo > hi`` raises,
    matching the parity UDF family.
    """

    def eval(self, n: int, lo: int, hi: int):
        import numpy as np

        if n is None or n <= 0:
            return
        if lo is None or hi is None:
            for i in range(n):
                yield (i, None)
            return
        if lo > hi:
            raise ValueError("randgen_uniform_rows: lo > hi")
        rng = np.random.default_rng()
        xs = rng.integers(lo, hi, size=n, endpoint=True)
        for i in range(n):
            yield (i, int(xs[i]))


def register_udtfs(spark: SparkSession) -> None:
    """Register the table functions (idempotent; called by add_udfs)."""
    spark.udtf.register("randgen_series", udtf(RandgenSeries, returnType="value: bigint"))
    spark.udtf.register(
        "randgen_uniform_rows", udtf(RandgenUniformRows, returnType="id: bigint, x: bigint")
    )
    spark.udtf.register("randgen_table", udtf(RandgenTable))


class RandgenTable:
    """POLYMORPHIC table generator: output schema is computed from the
    spec argument at ANALYSIS time (Spark 4 UDTF ``analyze``), so one
    registration serves any column mix::

        FROM randgen_table(100, 'a:int64_uniform:1:10, b:float64_normal:0:1, c:bool_bernoulli:0.5', 42)

    Spec grammar: ``name:kind[:p1[:p2]]`` comma-separated; kinds:
    ``int64_uniform:lo:hi`` (inclusive, reference semantics),
    ``float64_uniform:lo:hi``, ``float64_normal:mean:std``,
    ``bool_bernoulli:p``.  A non-null ``seed`` makes the table
    reproducible.  Single-task by design (UDTF with literal args) —
    the declarative ``sources.synthetic`` spec generator is the scale
    path; this is its SQL-callable counterpart.
    """

    @staticmethod
    def analyze(n, spec, seed=None):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import (
            BooleanType,
            DoubleType,
            LongType,
            StructType,
        )

        types = {
            "int64_uniform": LongType(),
            "float64_uniform": DoubleType(),
            "float64_normal": DoubleType(),
            "bool_bernoulli": BooleanType(),
        }
        schema = StructType().add("id", LongType())
        for field in str(spec.value).split(","):
            parts = [p.strip() for p in field.strip().split(":")]
            name, kind = parts[0], parts[1]
            if kind not in types:
                raise ValueError(f"randgen_table: unknown kind '{kind}'")
            schema = schema.add(name, types[kind])
        return AnalyzeResult(schema=schema)

    def eval(self, n: int, spec: str, seed: int = None):
        import numpy as np

        rng = np.random.default_rng(seed)
        cols = []
        for field in spec.split(","):
            parts = [p.strip() for p in field.strip().split(":")]
            kind, args = parts[1], [float(a) for a in parts[2:]]
            if kind == "int64_uniform":
                lo, hi = int(args[0]), int(args[1])
                if lo > hi:
                    raise ValueError("randgen_table: lo > hi")
                cols.append(rng.integers(lo, hi, size=n, endpoint=True))
            elif kind == "float64_uniform":
                cols.append(rng.uniform(args[0], args[1], size=n))
            elif kind == "float64_normal":
                cols.append(rng.normal(args[0], args[1], size=n))
            elif kind == "bool_bernoulli":
                cols.append(rng.random(n) < args[0])
        for i in range(n):
            yield (i, *[c[i].item() for c in cols])
