"""Canonical test-table access.

The driver provides TPC-H-ish parquet at /root/testdata/sf*/ :
region nation customer supplier part orders lineitem events documents
embeddings. These helpers centralize reads so every query benefits
from the same scan config (column pruning + predicate pushdown happen
at the parquet scan via Catalyst automatically).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any realistic SF.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    sf_dir = sf_dir or DEFAULT_SF_DIR
    # Defensive tz pin: the caller may hand us a session built without
    # session.py (the round driver's own). Every NTZ->timestamp cast,
    # epoch extraction, and to_date boundary in the queries assumes
    # UTC — a session in another zone would shift midnight-aligned
    # TPC-H dates and diverge from the DuckDB oracle's naive-UTC
    # semantics. Runtime-settable SQL conf, so safe to set per call.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # Defensive: the caller may hand us a session built without
        # session.py (e.g. the round driver's own). nanosAsLong is a
        # runtime-settable SQL conf; without it TIMESTAMP(NANOS)
        # parquet is unreadable.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as raw int64 (nanosAsLong); truncate to
        # microseconds — the same ns->us truncation DuckDB/Arrow apply.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def spread(df: DataFrame) -> DataFrame:
    """Rebalance a scan feeding a CPU-heavy NARROW stage (per-doc
    hashing, shingling, sketching).

    Parquet splits at row-group granularity, so a small file (or any
    single-row-group file, like the local test data) scans as ONE
    partition — a narrow map pipeline then runs on one core no matter
    how many the session has. Round-robin repartition to
    defaultParallelism only when the scan is under-split; on a real
    cluster a 100 TB input has thousands of row-group splits and this
    is a no-op (no shuffle added)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # Estimate the scan's split count from file sizes instead of
    # df.rdd.getNumPartitions(): the plan->RDD conversion costs
    # 50-170 ms per fresh DataFrame (plus ~1 s on a session's first
    # call) — a measurable tax on every spread() query, for a number
    # Spark derives from bytes/maxPartitionBytes anyway. Replicate
    # FilePartition.maxSplitBytes: Spark BIN-PACKS small files (each
    # padded by openCostInBytes) into partitions of
    # min(maxPartitionBytes, max(openCost, totalPadded/parallelism))
    # bytes — a naive per-file ceil(size/maxPartitionBytes) equals the
    # file COUNT for many-small-files inputs and overshoots, skipping
    # the repartition in exactly the under-parallelized case spread()
    # exists to fix. The packed estimate is a lower bound on Spark's
    # actual partition count, so it errs toward repartitioning (safe).
    try:
        files = [u[7:] for u in df.inputFiles() if u.startswith("file:")]
        if files:
            conf = df.sparkSession.conf
            max_bytes = int(str(conf.get(
                "spark.sql.files.maxPartitionBytes",
                "134217728")).rstrip("b"))
            open_cost = int(str(conf.get(
                "spark.sql.files.openCostInBytes",
                "4194304")).rstrip("b"))
            padded = sum(os.path.getsize(f) + open_cost for f in files)
            max_split = min(max_bytes,
                            max(open_cost, padded // max(target, 1)))
            est = -(-padded // max(max_split, 1))
            # Byte-range splits cannot split a ROW GROUP: a 70 MB
            # single-row-group file "splits" into 32 planned
            # partitions of which 31 are empty (getNumPartitions()
            # lies the same way), so cap the estimate by the actual
            # row-group count. Footer reads cost ~ms each and are
            # only needed when the file count alone doesn't already
            # prove enough row groups exist.
            if len(files) < 2 * target:
                try:
                    import pyarrow.parquet as pq

                    est = min(est, sum(
                        pq.ParquetFile(f).metadata.num_row_groups
                        for f in files))
                except Exception:
                    pass  # not parquet / unreadable footer: keep est
            if est < target:
                return df.repartition(target)
            return df
    except Exception:
        pass  # non-local or opaque source: fall back to the exact check
    # getNumPartitions counts PLANNED splits (row-group-blind), so it
    # is only the fallback for opaque sources
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
