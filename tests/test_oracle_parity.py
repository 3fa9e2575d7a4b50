"""Local mirror of the driver's correctness gate: every queries() entry with
an oracle_sql() entry must match the DuckDB result exactly (row multiset,
column names, values) at sf0.001."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted((tuple(_canon(r[i]) for i in order) for r in rows), key=repr)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()
NAMES = sorted(set(QUERIES) & set(ORACLES))


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns
    con = _duck(SF_DIR)
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s = _rows_to_set(spark_cols, [tuple(r) for r in spark_rows])
    d = _rows_to_set(duck_cols, duck_rows)
    if s != d:
        only_s = [r for r in s if r not in set(map(tuple, d))][:5]
        only_d = [r for r in d if r not in set(map(tuple, s))][:5]
        raise AssertionError(f"{name}: value mismatch\n spark-only: {only_s}\n duck-only: {only_d}")


def test_all_queries_have_oracle_or_are_flagged():
    missing = sorted(set(QUERIES) - set(ORACLES))
    # engine-level rows-only entries are allowed; anything else must have an oracle
    assert all(m.startswith(("frontier_", "stream_")) for m in missing), missing


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
