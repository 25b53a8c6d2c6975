"""Stateful entries (scratch writes, managed tables, streaming
checkpoints) must be CALLABLE REPEATEDLY in one session with identical
results — the driver calls once, but bench reps and interactive use
call again.  Historical regression classes: saveAsTable refusing a
reused location, a reused streaming checkpoint silently skipping every
batch (zero rows on call 2), fixed scratch paths racing."""

from __future__ import annotations

import pytest

from datafusion_randgen_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

STATEFUL = [
    "q_merge_upsert_snapshot",
    "st_foreachbatch_upsert",
    "st_incremental_dedup",
    "q_small_file_compaction",
    "p_zorder_layout",
    "q_bucketed_colocated_join",
    "q_schema_evolution_merge",
    "d_snapshot_dedup",
    "r_pyparquet_sink_roundtrip",
]


@pytest.mark.parametrize("name", STATEFUL)
def test_second_call_matches_first(spark, name):
    first = sorted(map(str, QUERIES[name](spark, SF).collect()))
    second = sorted(map(str, QUERIES[name](spark, SF).collect()))
    assert first, f"{name}: first call returned no rows"
    assert first == second, f"{name}: second call diverged"
