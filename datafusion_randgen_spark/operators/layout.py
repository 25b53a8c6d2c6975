"""Physical-layout helpers: Z-order (Morton) multi-dimensional
clustering.

Spark has no native Z-order (Delta/Iceberg implement it as a rewrite);
the interleaving itself is plain bit arithmetic, so it codegens
JVM-side as a Catalyst expression — and the identical expression is
expressible in ANSI SQL, so the DuckDB oracle computes bit-equal
z-values.

Why it matters at 100 TB: range-partitioning + within-partition sort
on the z-value clusters rows so that BOTH dimensions' min/max file
statistics become selective — a filter on either column prunes files,
where single-column sort helps only its own column.  The layout write
is ordinary ``repartitionByRange(z).sortWithinPartitions(z)`` +
parquet; engines then skip via footer stats for free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["zvalue16", "ZVALUE16_SQL"]


def _spread16(x: Column) -> Column:
    """Interleave-ready bit spread of a 16-bit value: bit i moves to
    bit 2i (the classic magic-mask doubling sequence)."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def zvalue16(a: Column, b: Column) -> Column:
    """32-bit Morton z-value of two 16-bit dimensions (``a`` in the
    even bits, ``b`` in the odd bits).  Callers mod/bucketize wider
    domains down to 16 bits first — for layout purposes the z-value
    only needs to preserve LOCALITY, not identity."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def _spread16_sql(expr: str) -> str:
    # CAST to BIGINT first: DuckDB types bare int literals INT32, and
    # an INT32 left shift overflows at the final interleave step
    s = f"(CAST({expr} AS BIGINT) & 65535)"
    s = f"(({s} | ({s} << 8)) & 16711935)"
    s = f"(({s} | ({s} << 4)) & 252645135)"
    s = f"(({s} | ({s} << 2)) & 858993459)"
    s = f"(({s} | ({s} << 1)) & 1431655765)"
    return s


def ZVALUE16_SQL(a: str, b: str) -> str:
    """DuckDB mirror of :func:`zvalue16` ({a}/{b} = the two dimension
    expressions) — kept textually adjacent so the two definitions
    drift together or not at all.  Decimal mask literals because both
    engines parse them identically (hex literals differ)."""
    return f"({_spread16_sql(a)} | ({_spread16_sql(b)} << 1))"
