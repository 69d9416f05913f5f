"""Permanent oracle output-type audit.

DuckDB silently widens SUM(BIGINT) — plain or windowed — to HUGEINT,
and the driver's normalizer casts HUGEINT -> DOUBLE before hashing,
so a pure-integer oracle column hashes as `...0` float strings
against Spark's BIGINT strings and the gate goes red even though
both engines computed identical values (the r3 gate's only two
failures, `pagerank_parts.rank` and `training_batches_digest.
seq_idx`, were exactly this).  The r2 "zero offenders" sweep was a
one-off audit; this test makes it permanent: DESCRIBE every
registered oracle and assert every OUTPUT column lands in the safe
type set that the driver normalizer round-trips losslessly.
"""

from __future__ import annotations

import duckdb
import pytest

from distributed_system_mapreduce_spark.registry import ORACLES

SF_DIR = "/root/testdata/sf0.001"

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

# Types the driver's normalizer maps 1:1 onto Spark's string forms.
# HUGEINT/DECIMAL get floated (lossy `...0` strings vs Spark BIGINT);
# unsigned ints never appear in our schemas, so treat them as errors
# too rather than grandfathering a new footgun in.
SAFE_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT",
    "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
}


def _base_type(t: str) -> str:
    """DESCRIBE may report parameterized/nested types; compare the
    outermost constructor (lists/structs of safe types are safe)."""
    t = t.strip().upper()
    for prefix in ("STRUCT(", "MAP("):
        if t.startswith(prefix):
            return t.split("(", 1)[0]
    if t.endswith("[]"):
        return _base_type(t[:-2])
    return t.split("(", 1)[0].strip()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_hugeint_or_decimal_oracle_outputs(con):
    offenders = []
    for name, sql in sorted(ORACLES.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as ex:  # pragma: no cover - should not happen
            offenders.append((name, "<describe failed>", str(ex)[:120]))
            continue
        for col, coltype, *_ in desc:
            base = _base_type(coltype)
            if base in ("STRUCT", "MAP"):
                continue  # nested leaves handled by hash parity itself
            if base not in SAFE_TYPES:
                offenders.append((name, col, coltype))
    assert not offenders, (
        "oracle output columns with driver-unsafe types "
        "(HUGEINT/DECIMAL float-ify in the gate normalizer; CAST them "
        f"in the oracle SQL): {offenders}")
