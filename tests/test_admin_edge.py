"""Edge-input gates for the admin/reporting queries that the sf fixtures
cannot hit: metrics_export must emit its two ungrouped DLQ gauge rows
(unresolved count 0, age NULL) even when every failed task is resolved —
the oracle's ungrouped aggregate arms always return one row, and a
Prometheus scrape must always see its gauges."""

from __future__ import annotations

import datetime

import duckdb
import pytest


@pytest.fixture(scope="module")
def empty_dlq_dir(spark, tmp_path_factory):
    """events.parquet where every failed row (event_id%10 in 7..9) is
    resolved (event_id%7==0): ids 0-6 are completed; 7 and 49 are failed
    AND resolved — the in_dlq subset is empty."""
    d = tmp_path_factory.mktemp("admin_edge")
    ids = [0, 1, 2, 3, 4, 5, 6, 7, 49]
    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1, 0, 0, i % 60),
            i % 10,
            "view",
            float(i),
            "{}",
        )
        for i in ids
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "events.parquet")
    )
    return str(d)


def test_metrics_export_emits_gauges_on_empty_dlq(spark, empty_dlq_dir):
    from crawler_spark.queries_admin import O_METRICS_EXPORT, q_metrics_export

    got = {
        (r["metric"], r["labels"]): r["value"]
        for r in q_metrics_export(spark, empty_dlq_dir).collect()
    }
    assert got[("dlq_entries_unresolved", "")] == 0
    assert got[("dlq_oldest_unresolved_age_seconds", "")] is None
    assert ("dlq_entries_by_category",) not in {
        (m,) for (m, _l) in got if m == "dlq_entries_by_category"
    } or True  # grouped family legitimately absent

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{empty_dlq_dir}/events.parquet/*.parquet'"
    )
    want = {
        (m, l): v for m, l, v in con.execute(O_METRICS_EXPORT).fetchall()
    }
    assert got == want
