"""Shared lineage-cut helper with a session-level posture switch.

Iterative and multi-consumer plans need a materialization barrier so
round N (or consumer N) does not replay the whole upstream plan. Two
postures exist and they trade differently at scale:

* ``local`` — ``DataFrame.localCheckpoint()``: materializes into
  executor-local block storage and TRUNCATES lineage. Zero config and
  the fastest barrier on ``local[N]`` (the test posture), but on a
  real cluster an executor loss makes the checkpointed partitions
  unrecoverable — the whole query fails and restarts. Acceptable for
  tests; wrong default for a 1000-executor 100 TB run.
* ``persist`` — ``persist(MEMORY_AND_DISK)`` + an eager ``count()``:
  materializes into the block manager but PRESERVES lineage, so an
  executor loss degrades to recomputing the lost partitions instead
  of failing the query. This is the cluster posture. Cache lifetime
  belongs to the session (``spark.catalog.clearCache()`` or
  ``unpersist`` when done).

The posture is selected once per session, not per call site:

* runtime conf ``spark.graft.lineageCut`` = ``local`` | ``persist``
  (settable live via ``spark.conf.set``), falling back to
* env ``SPARK_GRAFT_LINEAGE_CUT``, falling back to ``local``.

Every operator routes its barrier through :func:`cut` (usually as
``.transform(cut)`` to keep method-chain style); no operator calls
``localCheckpoint`` directly, so flipping the one switch moves the
entire engine to the cluster posture.

Streaming exception: a barrier INSIDE a foreachBatch sink pins
``mode="local"`` — Structured Streaming's micro-batch retry (replay
from the source checkpoint) is already the recovery layer there, and
the persist posture would leak one never-unpersisted cache entry per
batch on a long-running stream. Stream-lifetime STATIC sides (e.g. a
broadcast LM model) follow the session switch like batch operators.

Reference parity note: the reference engine (run_server.go:348-406
job loop) persists inter-round state to SDFS — replicated, so a
worker loss recovers. ``persist`` mode is the Spark-native analogue
(block manager + lineage recompute); ``local`` mode trades that
recoverability for speed on a single-JVM test box.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame

CONF_KEY = "spark.graft.lineageCut"
ENV_KEY = "SPARK_GRAFT_LINEAGE_CUT"
_VALID = ("local", "persist")


def posture(df: DataFrame) -> str:
    """Resolve the session's lineage-cut posture for ``df``."""
    mode = df.sparkSession.conf.get(CONF_KEY, "") or os.environ.get(ENV_KEY, "")
    mode = (mode or "local").strip().lower()
    if mode not in _VALID:
        raise ValueError(
            f"{CONF_KEY} must be one of {_VALID}, got {mode!r}")
    return mode


def cut(df: DataFrame, eager: bool = True, mode: str | None = None) -> DataFrame:
    """Materialization barrier honoring the session posture.

    ``eager=False`` defers materialization to the first action (the
    rare case where the caller may never consume the cut subtree);
    both postures honor it — lazy localCheckpoint, or persist without
    the forcing ``count()``. ``mode`` overrides the session posture
    for callers that expose a per-query ``persist=`` knob.
    """
    if mode is not None and mode not in _VALID:
        raise ValueError(f"mode must be one of {_VALID}, got {mode!r}")
    if (mode or posture(df)) == "local":
        return df.localCheckpoint(eager=eager)
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    if eager:
        out.count()
    return out


def cut_lazy(df: DataFrame) -> DataFrame:
    """``cut`` with ``eager=False`` — chainable via ``.transform``."""
    return cut(df, eager=False)
