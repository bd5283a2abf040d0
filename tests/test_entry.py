"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables, compare row counts, column names, and values
(order-insensitive, exact after the queries' own rounding)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("ENTRY_SF_DIR", "/root/testdata/sf0.001")

QUERY_NAMES = sorted(entrymod.queries().keys())


def duck_con(sf_dir):
    con = duckdb.connect()
    from nifi_processors_spark.plans.catalog import TABLES

    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(rows, cols):
    """Sort columns by name, convert values to comparable primitives,
    sort rows — mirrors an order-insensitive value hash."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def conv(v):
        if v is None:
            return ("\x00null",)
        if isinstance(v, float):
            if math.isnan(v):
                return ("nan",)
            return ("f", round(v, 9))
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, int):
            return ("i", v)
        return ("s", str(v))

    return sorted(tuple(conv(r[i]) for i in order) for r in rows)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    fn = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in oracles:
        assert len(srows) >= 0  # rows-only check for non-SQL ops
        return
    con = duck_con(SF_DIR)
    res = con.sql(oracles[name])
    dcols = res.columns
    # The driver's value hash is TYPE-sensitive on the DuckDB side:
    # HUGEINT (what DuckDB's sum() over integers returns) hashes
    # differently from the BIGINT Spark emits even when values are
    # equal, and this file's int-normalizing compare cannot see that.
    # Gate the oracle's column types to the hash-safe set (round-1
    # failures q12/pivot/sessionize/simhash were all HUGEINT).
    HASH_SAFE = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT",
                 "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN"}
    bad = [
        (c, str(t)) for c, t in zip(res.columns, res.types)
        if str(t).upper() not in HASH_SAFE
    ]
    assert not bad, (
        f"{name}: oracle emits driver-hash-unsafe types {bad}; "
        "cast integer sums with @BSUM(...)@ / cast(... AS bigint)"
    )
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} (spark) vs {len(drows)} (duckdb)"
    )
    a, b = normalize(srows, scols), normalize(drows, dcols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
