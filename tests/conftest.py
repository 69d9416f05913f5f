import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from distributed_system_mapreduce_spark.session import get_spark  # noqa: E402
from distributed_system_mapreduce_spark.tables import TABLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(cols, rows):
    """Order-insensitive, column-name-sorted canonical form (mirrors
    the driver's compare)."""
    import datetime
    import decimal
    import math

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v)
        if isinstance(v, decimal.Decimal):
            return repr(float(v))
        if isinstance(v, datetime.datetime):
            return v.strftime("%Y-%m-%d %H:%M:%S.%f")
        return str(v)

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x01".join(cell(r[i]) for i in order) for r in rows)
