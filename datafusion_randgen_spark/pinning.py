"""Switchable materialization-pin strategy (VERDICT r10 task 3).

The iterative / fan-out operators (skew-routed dedup, BPE training,
connected components, BFS) must pin intermediate frames so a frame
consumed by several branches or re-derived every round is computed
once.  Two strategies exist with opposite tradeoffs:

- ``localCheckpoint`` (default): truncates lineage AND the logical
  plan — the pinned frame becomes a scan of executor-local blocks, so
  per-round plan growth is impossible and plan tests can pin "no
  source re-scan".  Cost: blocks live only on executors; on a cluster
  with executor churn a lost executor fails the job instead of
  recomputing.
- ``persist`` (``MEMORY_AND_DISK``): keeps lineage, so a lost
  executor's partitions are recomputed from source — the right default
  for a long-running 1000-executor deployment.  Cost: the logical plan
  keeps growing across rounds (bounded-iteration algorithms only), and
  callers must :func:`unpin` superseded frames or executor storage
  accumulates every round.

A third option — reliable ``checkpoint()`` to shared storage — gives
both properties at the price of an HDFS/S3 round trip per pin; it
needs ``spark.sparkContext.setCheckpointDir`` and is deliberately not
wired here (no shared storage in the test container), but a cluster
deployment choosing it only has to extend :func:`pin`.

Both modes are exercised by the routing-invariance tests
(``tests/test_operators.py``); the single-scan plan pin holds in the
default mode (``tests/test_plans.py``).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark import StorageLevel
from pyspark.sql import DataFrame

LOCAL_CHECKPOINT = "localCheckpoint"
PERSIST = "persist"

_strategy = LOCAL_CHECKPOINT


def get_pin_strategy() -> str:
    return _strategy


def set_pin_strategy(mode: str) -> None:
    if mode not in (LOCAL_CHECKPOINT, PERSIST):
        raise ValueError(
            f"pin strategy must be {LOCAL_CHECKPOINT!r} or {PERSIST!r},"
            f" got {mode!r}"
        )
    global _strategy
    _strategy = mode


@contextmanager
def pin_strategy(mode: str):
    """Temporarily switch the pin strategy (test harness use)."""
    prev = get_pin_strategy()
    set_pin_strategy(mode)
    try:
        yield
    finally:
        set_pin_strategy(prev)


def pin(df: DataFrame, eager: bool = True, replaces: DataFrame | None = None) -> DataFrame:
    """Materialization-pin ``df`` under the active strategy.

    ``replaces``: the frame this pin supersedes in an iterative loop
    (previous round's labels/words/visited set).  Under ``persist`` it
    is unpersisted once the new pin is materialized so executor
    storage stays O(one round); under ``localCheckpoint`` it is
    ignored (superseded blocks are GC'd with their DataFrame).
    ``replaces`` is honored only with ``eager=True`` — a lazy pin has
    not materialized yet, so releasing its predecessor here would
    force the first action to recompute inputs from source; lazy
    callers release the predecessor themselves via :func:`unpin` after
    their first action (the connected-components pattern).  Passing
    both ``eager=False`` and ``replaces`` is therefore a caller bug —
    silently ignoring it would leak the predecessor frame under
    ``persist`` — and raises (ADVICE r11).
    """
    if replaces is not None and not eager:
        raise ValueError(
            "pin(eager=False) cannot honor replaces= — the lazy pin has"
            " not materialized, so the predecessor must stay pinned;"
            " release it via unpin() after your first action instead"
        )
    if _strategy == LOCAL_CHECKPOINT:
        return df.localCheckpoint(eager=eager)
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    if eager:
        out.count()
        if replaces is not None:
            unpin(replaces)
    return out


def unpin(df: DataFrame) -> None:
    """Release a pinned frame (no-op under ``localCheckpoint``)."""
    if _strategy == PERSIST:
        df.unpersist()
