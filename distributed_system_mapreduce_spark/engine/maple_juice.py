"""MapleJuice — the reference's MapReduce programming model on Spark.

Reference contract (/root/reference/maple_juice/maple_juice.go):
- ``maple <exe> <N> <prefix> <src>``: split src into N line-clips
  (split, maple_juice.go:32), run exe per clip (stdin lines -> stdout
  "key value" lines, executeMapleExe:241), bucket output by key into
  prefix_<key> files (splitMapleResultFile:266).
- ``juice <exe> <N> <prefix> <dest> <del> <hash|range>``: assign keys
  to N workers by FNV hash (Hash:773) or sorted key ranges
  (Shuffle:688), run exe once per key over that key's lines
  (JuiceTask:376), append outputs to dest.

Spark-first translation — the *phases* map onto Spark's native
physical operators instead of files + RPC:

  reference                         here
  ---------                         ----
  line clips -> N workers           input DataFrame partitions
  maple exe over a clip             mapInPandas (Arrow batches)
  prefix_<key> intermediate files   the shuffle (no files, no per-key
                                    metadata explosion at 100 TB)
  hash shuffle                      groupBy(key) hash exchange
  range shuffle                     repartitionByRange + in-partition
                                    grouping (equal keys co-located)
  juice exe per key                 applyInPandas per group

User functions are Arrow-batched pandas callables (10-100x over
row-at-a-time UDFs); a legacy line-oriented adapter wraps any
old stdin/stdout-style job in one `wrap_line_job` call.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KV_SCHEMA = T.StructType([
    T.StructField("key", T.StringType(), False),
    T.StructField("value", T.StringType(), True),
])


def wrap_line_job(
    line_fn: Callable[[str], Iterable[tuple[str, str]]],
) -> Callable[[pd.Series], pd.DataFrame]:
    """Adapt a legacy per-line maple job (one input line -> zero or
    more (key, value) pairs, the stdin/stdout contract of the
    reference's exes) into a vectorized batch function."""

    def batch_fn(lines: pd.Series) -> pd.DataFrame:
        keys: list[str] = []
        vals: list[str] = []
        for line in lines:
            if line is None:
                continue
            for k, v in line_fn(line):
                keys.append(k)
                vals.append(v)
        return pd.DataFrame({"key": keys, "value": vals})

    return batch_fn


class MapleJuice:
    """Programmable MapReduce over DataFrames.

    >>> mj = MapleJuice(spark)
    >>> kv = mj.maple(lines_df, wrap_line_job(my_map))     # (key, value)
    >>> out = mj.juice(kv, my_reduce, num_tasks=32)        # reduce per key
    """

    def __init__(self, spark):
        self.spark = spark

    # ------------------------------------------------------------- maple
    def maple(
        self,
        src: DataFrame,
        batch_fn: Callable[[pd.Series], pd.DataFrame],
        num_tasks: int | None = None,
        input_col: str | None = None,
    ) -> DataFrame:
        """Map phase: emit a (key, value) DataFrame.

        ``src`` is any DataFrame; ``input_col`` names the line column
        (defaults to the single column, like the reference's
        line-oriented clips). ``num_tasks`` forces a repartition only
        when the caller wants reference-equivalent clip counts —
        otherwise Spark's existing partitioning is reused (cheaper).
        """
        col = input_col or src.columns[0]
        if num_tasks:
            src = src.repartition(num_tasks)

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                out = batch_fn(b[col])
                if out is not None and len(out):
                    yield out[["key", "value"]].astype(
                        {"key": "string", "value": "string"})

        return src.mapInPandas(run, schema=KV_SCHEMA)

    # ------------------------------------------------------------- juice
    def juice(
        self,
        kv: DataFrame,
        reduce_fn: Callable[[str, pd.DataFrame], pd.DataFrame],
        num_tasks: int | None = None,
        partition: str = "hash",
        output_schema: T.StructType | str | None = None,
        key_col: str = "key",
    ) -> DataFrame:
        """Reduce phase: apply ``reduce_fn(key, group_df)`` per key.

        partition="hash"  -> Catalyst hash exchange (groupBy), the
                             default and fastest path.
        partition="range" -> repartitionByRange on the key (sampled
                             contiguous key ranges, the reference's
                             sorted-deal semantics, Shuffle:688) then
                             per-partition grouping; equal keys land
                             in one range bucket so grouping holds.
        """
        if output_schema is None:
            output_schema = KV_SCHEMA
        if partition not in ("hash", "range"):
            raise ValueError("partition must be 'hash' or 'range'")

        if partition == "hash":
            # num_tasks is advisory here: the groupBy exchange is sized
            # by spark.sql.shuffle.partitions + AQE coalescing, which is
            # the right knob at scale (a fixed N would fight the
            # optimizer). Pre-repartitioning would just add a shuffle.
            def apply(pdf: pd.DataFrame) -> pd.DataFrame:
                return reduce_fn(pdf[key_col].iloc[0], pdf)

            return kv.groupBy(key_col).applyInPandas(
                apply, schema=output_schema)

        # range: one range shuffle, then group inside each partition
        n = num_tasks or kv.sparkSession.conf.get(
            "spark.sql.shuffle.partitions")
        ranged = kv.repartitionByRange(int(n), F.col(key_col))

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            parts = [b for b in batches if len(b)]
            if not parts:
                return
            whole = pd.concat(parts, ignore_index=True)
            for key, grp in whole.groupby(key_col, sort=True):
                out = reduce_fn(key, grp)
                if out is not None and len(out):
                    yield out

        return ranged.mapInPandas(run, schema=output_schema)

    # -------------------------------------------------- one-shot pipeline
    def run(
        self,
        src: DataFrame,
        batch_fn: Callable[[pd.Series], pd.DataFrame],
        reduce_fn: Callable[[str, pd.DataFrame], pd.DataFrame],
        num_maples: int | None = None,
        num_juices: int | None = None,
        partition: str = "hash",
        output_schema: T.StructType | str | None = None,
        input_col: str | None = None,
    ) -> DataFrame:
        """maple + juice in one call — the `command_backup` two-liner."""
        kv = self.maple(src, batch_fn, num_maples, input_col)
        return self.juice(kv, reduce_fn, num_juices, partition,
                          output_schema)
