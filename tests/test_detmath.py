"""functions/detmath.ln_det: the nested-sqrt natural-log
approximation must be (a) bit-identical between Spark and DuckDB —
the whole point, libm/JVM ln() is not — and (b) within its
documented error envelope of the true ln."""

import math

import duckdb
import pytest

from distributed_system_mapreduce_spark.functions.detmath import ln_det

VALUES = [1e-6, 1e-4, 0.03, 0.5, 0.9999, 1.0, 1.0001, 2.0,
          math.pi, 97.0, 1e4, 1e8]


def test_ln_det_bit_identical_cross_engine(spark):
    con = duckdb.connect()
    exprs = ", ".join(ln_det(repr(v)) for v in VALUES)
    duck = con.execute(f"SELECT {exprs}").fetchone()
    spk = spark.sql(f"SELECT {exprs}").collect()[0]
    for v, d, s in zip(VALUES, duck, spk):
        assert d == s, (v, d, s)  # bitwise equality, not approx


def test_ln_det_error_envelope(spark):
    rows = spark.sql("SELECT " + ", ".join(
        ln_det(repr(v)) for v in VALUES)).collect()[0]
    for v, got in zip(VALUES, rows):
        true = math.log(v)
        # documented: ln^2/2^21 series error + 2^-32 quantization
        bound = true * true / (1 << 21) + 2e-9 + 1e-12
        assert abs(got - true) <= bound * 1.5 + 1e-7, (v, got, true)


def test_ln_det_rejects_nothing_but_is_monotone(spark):
    rows = spark.sql("SELECT " + ", ".join(
        ln_det(repr(v)) for v in sorted(VALUES))).collect()[0]
    assert list(rows) == sorted(rows)  # monotone in x
