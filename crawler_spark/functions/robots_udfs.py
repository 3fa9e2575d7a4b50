"""Vectorized robots.txt evaluation (north-rule addition; no reference analogue).

Robots policies are a tiny per-host dimension (one robots.txt per host). The
scalable plan: parse each host's robots.txt ONCE into a compact rules table,
broadcast it, and evaluate (host, path) per frontier row inside an Arrow-batched
pandas UDF with a per-executor parsed-policy cache — no per-row parsing, no
per-row Python in the driver plan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from crawler_spark.kernels.robots import RobotsPolicy, parse_robots


def robots_dim(spark: SparkSession, robots_by_host: dict[str, str]) -> DataFrame:
    """Materialize the (host, robots_txt) dimension table."""
    return spark.createDataFrame(
        list(robots_by_host.items()), schema="host string, robots_txt string"
    )


def robots_eval_udfs(robots_by_host: dict[str, str], user_agent: str):
    """Returns (allowed_udf(host, path) -> bool, delay_udf(host) -> double).

    The dict rides the UDF closure (Spark broadcasts closures per-executor);
    policies are parsed lazily once per executor and memoized.
    """
    cache: dict[str, RobotsPolicy] = {}

    def _policy(host: str) -> RobotsPolicy | None:
        if host not in cache:
            txt = robots_by_host.get(host)
            cache[host] = parse_robots(txt) if txt is not None else None
        return cache[host]

    @pandas_udf("boolean")
    def allowed_udf(host: pd.Series, path: pd.Series) -> pd.Series:
        out = []
        for h, p in zip(host, path):
            pol = _policy(h) if h is not None else None
            out.append(True if pol is None else pol.is_allowed(user_agent, p or "/"))
        return pd.Series(out)

    @pandas_udf("double")
    def delay_udf(host: pd.Series) -> pd.Series:
        out = []
        for h in host:
            pol = _policy(h) if h is not None else None
            d = pol.crawl_delay(user_agent) if pol is not None else None
            out.append(d)
        return pd.Series(out, dtype="float64")

    return allowed_udf, delay_udf


def apply_robots_filter(
    frontier: DataFrame,
    robots_by_host: dict[str, str],
    user_agent: str = "lexi-spark",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Drop disallowed URLs; attach crawl_delay_s for the politeness budget.
    Excluded rows are the caller's to log (use robots_exclusions for that)."""
    allowed_udf, delay_udf = robots_eval_udfs(robots_by_host, user_agent)
    return (
        frontier.withColumn("robots_allowed", allowed_udf(F.col(host_col), F.col(path_col)))
        .filter(F.col("robots_allowed"))
        .withColumn("crawl_delay_s", delay_udf(F.col(host_col)))
        .drop("robots_allowed")
    )


def robots_exclusions(
    frontier: DataFrame,
    robots_by_host: dict[str, str],
    user_agent: str = "lexi-spark",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    allowed_udf, _ = robots_eval_udfs(robots_by_host, user_agent)
    return frontier.filter(~allowed_udf(F.col(host_col), F.col(path_col)))


def robots_decide_udf():
    """Struct UDF (robots_txt, user_agent, path) -> (allowed, crawl_delay_s).

    Unlike robots_eval_udfs (driver-known host->txt map in the closure), the
    policy TEXT rides as a column — the full parse -> group-select -> match
    path is exercised per distinct policy, memoized per executor (one parse
    per distinct robots.txt, not per row; clear-on-full bound like the
    simhash token cache — executors are long-lived, ~one distinct policy
    per host is unbounded at web scale)."""
    cache: dict[str, RobotsPolicy] = {}
    cache_max = 1 << 16

    def _policy(txt: str) -> RobotsPolicy:
        pol = cache.get(txt)
        if pol is None:
            if len(cache) >= cache_max:
                cache.clear()
            pol = cache[txt] = parse_robots(txt)
        return pol

    @pandas_udf("allowed boolean, crawl_delay_s double")
    def _decide(txt: pd.Series, ua: pd.Series, path: pd.Series) -> pd.DataFrame:
        rows = []
        for t, u, p in zip(txt, ua, path):
            if t is None:
                rows.append((True, None))
                continue
            pol = _policy(t)
            rows.append((pol.is_allowed(u, p or "/"), pol.crawl_delay(u)))
        return pd.DataFrame(rows, columns=["allowed", "crawl_delay_s"])

    return _decide


def url_path_col(url: Column) -> Column:
    """Path+query extraction as a JVM-side expression (no UDF): strip scheme,
    then everything from the first '/'; bare-host URLs -> '/'. """
    no_scheme = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    path = F.regexp_extract(no_scheme, r"(/.*)$", 1)
    return F.when(path == "", F.lit("/")).otherwise(path)
