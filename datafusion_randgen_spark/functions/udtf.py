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
        if start is None or stop is None or step is None:
            return  # NULL argument -> empty series (NULL propagation)
        if step == 0:
            raise ValueError("randgen_series: step must not be zero")
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


#: spec kind -> Spark DDL type, mirroring ``sources.synthetic._column``'s
#: grammar so the SQL surface matches the Python one kind-for-kind.
_TABLE_KINDS = {
    "int64_uniform": "bigint",
    "float64_uniform": "double",
    "float64_normal": "double",
    "float64_exponential": "double",
    "float64_lognormal": "double",
    "bool_bernoulli": "boolean",
    "zipf": "bigint",
    "element_from": "string",
    "element_from_weighted": "string",
    "string_alpha": "string",
    "timestamp_uniform": "timestamp",
    "date_uniform": "date",
}

_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def _parse_spec(spec: str) -> list[tuple[str, str, list[str]]]:
    out = []
    for field in str(spec).split(","):
        parts = [p.strip() for p in field.strip().split(":")]
        if len(parts) < 2:
            raise ValueError(f"randgen_table: bad spec field {field!r}")
        name, kind, args = parts[0], parts[1], parts[2:]
        if kind not in _TABLE_KINDS:
            raise ValueError(f"randgen_table: unknown kind '{kind}'")
        out.append((name, kind, args))
    return out


class RandgenTable:
    """POLYMORPHIC table generator: output schema is computed from the
    spec argument at ANALYSIS time (Spark 4 UDTF ``analyze``), so one
    registration serves any column mix::

        FROM randgen_table(100, 'a:int64_uniform:1:10, b:zipf:1000:1.2, c:element_from_weighted:x|y|z:1|2|3', 42)

    Spec grammar: ``name:kind[:p1[:p2]]`` comma-separated — the FULL
    ``sources.synthetic`` grammar, one kind for one kind:
    ``int64_uniform:lo:hi`` (inclusive, reference semantics),
    ``float64_uniform:lo:hi``, ``float64_normal:mean:std``,
    ``float64_exponential:rate``, ``float64_lognormal:mu:sigma``,
    ``bool_bernoulli:p``, ``zipf:n:s``, ``element_from:v1|v2|...``,
    ``element_from_weighted:v1|v2:w1|w2``, ``string_alpha:length``,
    ``timestamp_uniform:YYYY-MM-DD:YYYY-MM-DD``,
    ``date_uniform:YYYY-MM-DD:YYYY-MM-DD`` (list-valued params are
    ``|``-separated since ``:`` delimits params).  A non-null ``seed``
    makes the table reproducible.  Single-task by design (UDTF with
    literal args) — the declarative ``sources.synthetic`` spec
    generator is the scale path; this is its SQL-callable counterpart.
    """

    @staticmethod
    def analyze(n, spec, seed=None):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import (
            BooleanType,
            DateType,
            DoubleType,
            LongType,
            StringType,
            StructType,
            TimestampType,
        )

        # analyze() runs in a context-free Python subprocess — build
        # types directly, no DDL parsing (that needs a SparkContext).
        ddl_to_type = {
            "bigint": LongType(),
            "double": DoubleType(),
            "boolean": BooleanType(),
            "string": StringType(),
            "timestamp": TimestampType(),
            "date": DateType(),
        }
        schema = StructType().add("id", LongType())
        for name, kind, _ in _parse_spec(spec.value):
            schema = schema.add(name, ddl_to_type[_TABLE_KINDS[kind]])
        return AnalyzeResult(schema=schema)

    def eval(self, n: int, spec: str, seed: int = None):
        import datetime as dt

        import numpy as np

        if n is None or spec is None or n <= 0:
            return  # NULL/empty request -> empty table, like randgen_uniform_rows
        rng = np.random.default_rng(seed)
        cols = []
        for _, kind, args in _parse_spec(spec):
            if kind == "int64_uniform":
                lo, hi = int(args[0]), int(args[1])
                if lo > hi:
                    raise ValueError("randgen_table: lo > hi")
                cols.append(rng.integers(lo, hi, size=n, endpoint=True))
            elif kind == "float64_uniform":
                cols.append(rng.uniform(float(args[0]), float(args[1]), size=n))
            elif kind == "float64_normal":
                cols.append(rng.normal(float(args[0]), float(args[1]), size=n))
            elif kind == "float64_exponential":
                cols.append(rng.exponential(1.0 / float(args[0]), size=n))
            elif kind == "float64_lognormal":
                cols.append(rng.lognormal(float(args[0]), float(args[1]), size=n))
            elif kind == "bool_bernoulli":
                cols.append(rng.random(n) < float(args[0]))
            elif kind == "zipf":
                # same bounded inverse-CDF approximation as the
                # declarative generator (synthetic._seeded_zipf); at the
                # removable singularity s=1 the formula's limit is n^u
                zn, s = int(args[0]), float(args[1])
                u = rng.random(n)
                if s == 1.0:
                    x = np.float64(zn) ** u
                else:
                    x = ((zn ** (1.0 - s) - 1.0) * u + 1.0) ** (1.0 / (1.0 - s))
                cols.append(np.clip(np.floor(x).astype(np.int64), 1, zn))
            elif kind == "element_from":
                values = args[0].split("|")
                cols.append(np.array(values)[rng.integers(0, len(values), size=n)])
            elif kind == "element_from_weighted":
                values = args[0].split("|")
                w = np.array([float(x) for x in args[1].split("|")])
                cols.append(rng.choice(np.array(values), size=n, p=w / w.sum()))
            elif kind == "string_alpha":
                length = int(args[0])
                idx = rng.integers(0, 26, size=(n, length))
                lut = np.array(list(_ALPHABET))
                cols.append(np.array(["".join(r) for r in lut[idx]]))
            elif kind == "timestamp_uniform":
                lo = dt.datetime.fromisoformat(args[0])
                hi = dt.datetime.fromisoformat(args[1])
                lo_us = int((lo - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
                hi_us = int((hi - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
                us = rng.integers(lo_us, hi_us, size=n, endpoint=True)
                epoch = dt.datetime(1970, 1, 1)
                cols.append([epoch + dt.timedelta(microseconds=int(x)) for x in us])
            elif kind == "date_uniform":
                lo_d = dt.date.fromisoformat(args[0])
                hi_d = dt.date.fromisoformat(args[1])
                off = rng.integers(0, (hi_d - lo_d).days, size=n, endpoint=True)
                cols.append([lo_d + dt.timedelta(days=int(x)) for x in off])
        for i in range(n):
            yield (
                i,
                *[c[i].item() if hasattr(c[i], "item") else c[i] for c in cols],
            )
