"""Per-host politeness-paced fetching (S5 + P3 + the fetch boundary).

The reference paces requests with an in-process token bucket
(local_rate_limiter.py:67-104) and fetches per-job sequentially under asyncio.
Here, pacing is reproduced deterministically inside `applyInPandas` groups:
one group per (host[, salt]) — URLs fetched in rank order under genuine
incremental token-bucket simulation on a VIRTUAL clock, so crawl order and
fetch timestamps are reproducible regardless of executor scheduling.

`paced_fetch_schedule` is the pure scheduling operator (assigns fetch_at_ms);
`fetch_against_corpus` additionally resolves responses from a broadcast
fixture corpus (status/content/retry_after) and applies the stateful
pagination stop rules (kernels.pagination.StopDetector) within each
(host, seed) pagination chain.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from crawler_spark.kernels.pagination import StopDetector

_TYPE = {"int": T.IntegerType(), "long": T.LongType(), "string": T.StringType(), "boolean": T.BooleanType()}


def _extend_schema(df: DataFrame, fields: list[tuple[str, str]]) -> T.StructType:
    """Copy (not mutate!) the DataFrame schema and append fields. Fields the
    input already carries are skipped — fetch_against_corpus composes over
    paced_fetch_schedule output (which already has fetch_at_ms), and a
    duplicate field in the result StructType would fail the Arrow batch
    conversion at runtime; the UDF overwrites such columns in place."""
    have = {f.name for f in df.schema.fields}
    return T.StructType(
        list(df.schema.fields)
        + [T.StructField(n, _TYPE[t]) for n, t in fields if n not in have]
    )


def _simulate_bucket(n: int, rps: float, burst: float) -> list[float]:
    """Virtual-clock token bucket: earliest fetch time (s) for n sequential
    requests; tokens start at full burst, refill at rps."""
    times: list[float] = []
    tokens = float(burst)
    t = 0.0
    for _ in range(n):
        if tokens < 1.0:
            wait = (1.0 - tokens) / rps
            t += wait
            tokens = 1.0
        tokens -= 1.0
        times.append(t)
    return times


def paced_fetch_schedule(df: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Assign a virtual fetch_at_ms to every row by per-host token-bucket
    pacing. Input needs columns: host, fetch_order (1-based rank), rps, burst.
    """
    group_cols = group_cols or ["host"]
    out_schema = _extend_schema(df, [("fetch_at_ms", "long")])

    def _pace(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("fetch_order").reset_index(drop=True)
        if len(pdf) > 0:
            raw = pdf["rps"].iloc[0]
            if pd.isna(raw) or float(raw) <= 0.0:
                # paused/blocked host (null or non-positive budget): schedule
                # NOTHING this round — the bucket simulation would otherwise
                # divide by zero the moment demand exceeds burst
                pdf = pdf.iloc[0:0]
        if len(pdf) == 0:
            pdf["fetch_at_ms"] = pd.Series([], dtype="int64")
            return pdf
        rps = float(pdf["rps"].iloc[0])
        burst = float(pdf["burst"].iloc[0])
        times = _simulate_bucket(len(pdf), rps, burst)
        pdf["fetch_at_ms"] = [int(t * 1000 + 0.5) for t in times]
        return pdf

    return df.groupBy(*group_cols).applyInPandas(_pace, schema=out_schema)


FETCH_RESULT_FIELDS = (
    "status_code int, content string, retry_after string, fetch_at_ms long, "
    "stopped boolean, stop_reason string"
)


def fetch_against_corpus(
    batch: DataFrame,
    corpus: dict[str, tuple[int, str, str | None]],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fetch a scheduled batch against a fixture corpus (url -> (status,
    content, retry_after)), paced per host, with stateful stop detection per
    (host, seed_id) pagination chain: once a chain hits a stop condition the
    remaining URLs of that chain in this round are marked stopped and NOT
    fetched (they consume no budget), mirroring the reference's sequential
    generate_with_stop_detection loop.

    Input columns required: url_norm, host, seed_id, fetch_order, rps, burst.
    The corpus is captured in the UDF closure -> shipped once per executor
    (broadcast-equivalent); at real scale this boundary is an async HTTP pool.
    """
    group_cols = group_cols or ["host"]
    out_schema = _extend_schema(
        batch, [tuple(f.rsplit(" ", 1)) for f in FETCH_RESULT_FIELDS.split(", ")]
    )

    def _fetch(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("fetch_order").reset_index(drop=True)
        if len(pdf) > 0:
            raw = pdf["rps"].iloc[0]
            if pd.isna(raw) or float(raw) <= 0.0:
                # paused host: fetch nothing (same contract as _pace)
                pdf = pdf.iloc[0:0]
        n = len(pdf)
        if n == 0:
            for col in ("status_code", "fetch_at_ms"):
                pdf[col] = pd.Series([], dtype="int64")
            for col in ("content", "retry_after", "stop_reason"):
                pdf[col] = pd.Series([], dtype="object")
            pdf["stopped"] = pd.Series([], dtype="bool")
            return pdf
        rps = float(pdf["rps"].iloc[0])
        burst = float(pdf["burst"].iloc[0])
        detectors: dict[str, StopDetector] = {}
        chain_stopped: dict[str, bool] = {}
        status_l, content_l, retry_l, t_l, stopped_l, reason_l = [], [], [], [], [], []
        tokens, t = float(burst), 0.0
        for row in pdf.itertuples(index=False):
            raw_seed = getattr(row, "seed_id", "")
            # pd.isna: a nullable numeric seed_id column surfaces nulls as
            # NaN, and NaN is truthy AND != itself — `or ""` would key each
            # null row under a DISTINCT chain, breaking the chain-stop
            # contract for every row after the first stopped one
            seed = "" if raw_seed is None or (
                isinstance(raw_seed, float) and raw_seed != raw_seed
            ) else str(raw_seed)
            if chain_stopped.get(seed):
                status_l.append(None); content_l.append(None); retry_l.append(None)
                t_l.append(None); stopped_l.append(True); reason_l.append("chain stopped")
                continue
            # consume politeness budget only for real fetches
            if tokens < 1.0:
                t += (1.0 - tokens) / rps
                tokens = 1.0
            tokens -= 1.0
            status, content, retry_after = corpus.get(row.url_norm, (404, "", None))
            det = detectors.setdefault(seed, StopDetector())
            stop, reason = det.check(status, content or "", row.url_norm)
            if stop:
                chain_stopped[seed] = True
            status_l.append(status); content_l.append(content); retry_l.append(retry_after)
            t_l.append(int(t * 1000 + 0.5)); stopped_l.append(stop); reason_l.append(reason or None)
        pdf["status_code"] = pd.array(status_l, dtype="Int64")
        pdf["content"] = content_l
        pdf["retry_after"] = retry_l
        pdf["fetch_at_ms"] = pd.array(t_l, dtype="Int64")
        pdf["stopped"] = stopped_l
        pdf["stop_reason"] = reason_l
        return pdf

    return batch.groupBy(*group_cols).applyInPandas(_fetch, schema=out_schema)
