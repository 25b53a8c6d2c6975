"""Mini-driver: run every catalog query on Spark AND its DuckDB oracle,
compare row count + schema-insensitive sorted values.  This mirrors the
real driver's t2 correctness gate so mismatches surface before rounds.

Run against sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF to
/root/testdata/sf0.01 to replicate the driver's exact data.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    """Type-tagged normalization: the real driver hashes TYPED values, so
    an int on one side and a Decimal/float on the other must mismatch
    locally too (that exact trap produced the one red CORRECTNESS_r01 row:
    DuckDB sum(BIGINT) -> decimal128 vs Spark sum -> bigint)."""
    import decimal

    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        # BIT-exact: the driver hashes the typed double, so engines must
        # agree to the last bit (catalog entries round() explicitly to
        # guarantee it) — a tolerance here would hide driver mismatches
        return ("float", v.hex())
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, datetime.datetime):
        return (
            "ts",
            v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds"),
        )
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("array", tuple(_norm_cell(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, _norm_cell(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v).hex())
    return ("other", repr(v))


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr), [colnames[i] for i in order]


def _arrow_cat(t) -> str:
    """Coarse type category of a pyarrow type (width-insensitive, like the
    value comparison) — but DECIMAL is its own category so DuckDB's
    HUGEINT sum() (-> decimal128) can never pass against Spark BIGINT.
    That exact trap made 6 CORRECTNESS_r02 rows red while this gate was
    fetchall()-based (duckdb materializes HUGEINT as plain int)."""
    import pyarrow.types as pt

    if pt.is_decimal(t):
        return "decimal"
    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_boolean(t):
        return "bool"
    if pt.is_timestamp(t):
        return "ts"
    if pt.is_date(t):
        return "date"
    if pt.is_string(t) or pt.is_large_string(t):
        return "str"
    if pt.is_binary(t) or pt.is_large_binary(t):
        return "bin"
    if pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t):
        return "array"
    return "other"


_SPARK_CAT = {
    "byte": "int", "short": "int", "integer": "int", "long": "int",
    "float": "float", "double": "float", "boolean": "bool",
    "timestamp": "ts", "timestamp_ntz": "ts", "date": "date",
    "string": "str", "binary": "bin",
}


def _spark_cat(dt) -> str:
    name = dt.typeName()
    if name in _SPARK_CAT:
        return _SPARK_CAT[name]
    if name == "decimal":
        return "decimal"
    if name == "array":
        return "array"
    return "other"


# Driver output contract (round-4 red rows): every catalog entry must
# return FLAT ATOMIC, NON-DECIMAL columns.  The driver's pandas
# canonicalizer throws `unhashable type: 'list'` on array/map/struct
# output columns, and its typed value-hash diverges on DECIMAL output
# columns even when values are bit-identical.  Aggregate internally with
# whatever types you want — but array_join/to_json/size arrays and cast
# decimals to BIGINT cents or rounded DOUBLE before returning.
_ALLOWED_OUTPUT_TYPES = {
    "byte", "short", "integer", "long", "float", "double", "boolean",
    "string", "binary", "date", "timestamp", "timestamp_ntz",
}


def _assert_output_contract(name: str, sdf) -> None:
    for f in sdf.schema.fields:
        assert f.dataType.typeName() in _ALLOWED_OUTPUT_TYPES, (
            f"{name}: output column '{f.name}' is "
            f"{f.dataType.simpleString()} — catalog entries must return "
            f"flat atomic non-decimal columns (driver canonicalizer/hash "
            f"cannot handle array/map/struct/decimal outputs)"
        )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    _assert_output_contract(name, sdf)
    srows = sdf.collect()
    scols = sdf.columns
    assert len(srows) >= 0  # smoke: executes

    if name not in ORACLES:
        assert len(srows) > 0, f"{name}: rows-only check returned empty"
        return

    con = _duck(SF_DIR)
    # Arrow-typed extraction, mirroring the driver's typed value-hash:
    # fetchall() would launder HUGEINT/decimal128 into plain Python int
    # and hide the #1 cross-engine divergence class.
    atbl = con.sql(ORACLES[name]).fetch_arrow_table()
    dcols = list(atbl.column_names)
    drows = [tuple(d[c] for c in dcols) for d in atbl.to_pylist()]

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    duck_types = {f.name: f.type for f in atbl.schema}
    for f in sdf.schema.fields:
        s_cat, d_cat = _spark_cat(f.dataType), _arrow_cat(duck_types[f.name])
        assert s_cat == d_cat, (
            f"{name}: column '{f.name}' type category differs — spark "
            f"{f.dataType.simpleString()} ({s_cat}) vs oracle arrow "
            f"{duck_types[f.name]} ({d_cat}); if the oracle is decimal, "
            f"CAST the DuckDB expression (sum over ints -> HUGEINT) to BIGINT"
        )
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    s_norm, _ = _normalize([tuple(r) for r in srows], scols)
    d_norm, _ = _normalize(drows, dcols)
    mismatches = [i for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={s_norm[mismatches[0]]} duck={d_norm[mismatches[0]]}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"n", "sum_qty", "min_w", "max_w"} <= set(df.columns)


def test_readme_catalog_count_matches_registry():
    """README's advertised entry count drifted twice (r3, r4) and again
    in r5 — enforce it: every 'NNN entries' claim in README.md must
    equal len(queries()).  Bump the README when adding entries."""
    import re
    from pathlib import Path

    readme = (Path(__file__).resolve().parent.parent / "README.md").read_text()
    claims = [int(m) for m in re.findall(r"\*?\*?(\d+) entries", readme)]
    assert claims, "README no longer states the catalog entry count"
    n = len(QUERIES)
    assert all(c == n for c in claims), (
        f"README claims {claims} entries but the catalog registers {n} — "
        f"update README.md's counts"
    )


def test_readme_catalog_block_is_generated_and_current():
    """The per-entry catalog inventory in README is GENERATED from the
    @query registry (r7: count drift became impossible rather than
    merely tested) — the checked-in block must equal a fresh render."""
    from pathlib import Path

    from datafusion_randgen_spark.catalog_doc import replace_block

    path = Path(__file__).resolve().parent.parent / "README.md"
    cur = path.read_text()
    assert replace_block(cur) == cur, (
        "README catalog block is stale — run "
        "python scripts/gen_readme_catalog.py"
    )
