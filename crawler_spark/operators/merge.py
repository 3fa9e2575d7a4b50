"""Latest-crawl-wins page upsert (Q1 — SURVEY.md §2.8).

The reference upserts crawled pages one row at a time with
``ON CONFLICT (website_id, url_hash) DO UPDATE`` — the latest crawl replaces
the stored row (`/root/reference/sql/queries/crawled_page.sql:1-37`). The
set-oriented equivalent is a MERGE: union both sides, keep one row per key
by recency.

On real Iceberg this is ``MERGE INTO pages USING incoming ON keys WHEN
MATCHED THEN UPDATE ...`` — a shuffle on the key either way; this
implementation is the engine-portable form over snapshot tables.

Scale notes: ONE hash shuffle on the merge keys; with both sides bucketed by
url_hash (the natural layout for the pages table) the shuffle disappears
entirely. The window is per-key (cardinality = |keys|), never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_latest_wins(
    existing: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """One row per key: greatest ``order_col`` wins; on ties the incoming
    side wins (ON CONFLICT DO UPDATE replaces even at equal timestamps).

    tiebreak_cols (descending, after the source tag): the arbiter for
    duplicate keys WITHIN the incoming side — the engine legitimately
    fetches a retry row and a re-discovered row for one URL in the same
    round (same fetched_round), and without a total order the surviving
    row's attributes would be nondeterministic across runs, breaking
    resume byte-parity. Callers whose incoming side is key-unique may omit
    it."""
    tagged = existing.select(incoming.columns).withColumn(
        "_src", F.lit(0)
    ).unionByName(incoming.withColumn("_src", F.lit(1)))
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(),
        F.col("_src").desc(),
        *[F.col(c).desc() for c in (tiebreak_cols or [])],
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
