"""User-defined aggregate surface — Arrow grouped-agg pandas UDFs.

The reference has no UDAF machinery (SURVEY.md §2.C: absent), but a
synthetic-data engine needs custom aggregates for *validating* generated
distributions at scale.  Spark's grouped-agg pandas UDF is the idiomatic
surface: one Arrow batch per group per partition, NumPy math, usable in
``df.groupBy().agg(...)`` and — once registered — in SQL ``GROUP BY``.

Scale note: a grouped-agg pandas UDF materializes each group in one
Python worker, so it is for *moderate-cardinality* groups (distribution
checks, per-category stats), not for billion-key aggregations — those
stay on built-in JVM aggregates.  That trade-off is inherent to custom
Python aggregation and is the same boundary ``applyInPandas`` has.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# NB: pass a DataType, not a DDL string — parsing "double" at decoration
# time needs a live SparkContext, which breaks plain `import` (pytest
# collection happens before any session exists).


@F.pandas_udf(T.DoubleType())
def gmean(v: pd.Series) -> float:
    """Geometric mean of the positive values (NULLs ignored, SQL-style);
    NULL if no positive values.  Oracle: ``exp(avg(ln(x)))``."""
    x = v.dropna()
    x = x[x > 0]
    if len(x) == 0:
        return None
    return float(np.exp(np.log(x.astype("float64")).mean()))


@F.pandas_udf(T.DoubleType())
def trimmed_mean_10(v: pd.Series) -> float:
    """Mean of the middle 80% (10% trimmed at each tail) — the robust
    location estimate you want when validating heavy-tailed generated
    columns.  Oracle: AVG over values between the 10th/90th quantiles."""
    x = v.dropna().astype("float64").sort_values().to_numpy()
    n = len(x)
    if n == 0:
        return None
    k = int(np.floor(n * 0.1))
    core = x[k : n - k] if n - 2 * k > 0 else x
    return float(core.mean())


def register_udafs(spark: SparkSession) -> None:
    """SQL-callable registration (idempotent; called by add_udfs)."""
    spark.udf.register("gmean", gmean)
    spark.udf.register("trimmed_mean_10", trimmed_mean_10)
