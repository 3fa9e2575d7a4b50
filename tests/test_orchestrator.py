"""W3-W5 workflow orchestration over real Spark steps: toposorted execution,
variable substitution into configs, condition gating on upstream aggregates,
dependency-failure skipping, config deep-merge."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine.orchestrator import WorkflowOrchestrator
from crawler_spark.kernels.workflow import merge_config

SF = "/root/testdata/sf0.001"


def _executors():
    def load(spark, cfg, inputs):
        return spark.read.parquet(cfg["path"])

    def filter_step(spark, cfg, inputs):
        (src,) = inputs.values()
        return src.filter(cfg["predicate"])

    def agg_step(spark, cfg, inputs):
        (src,) = inputs.values()
        return src.groupBy(cfg["key"]).agg(F.count("*").alias("n"))

    def boom(spark, cfg, inputs):
        raise RuntimeError("executor exploded")

    return {"load": load, "filter": filter_step, "agg": agg_step, "boom": boom}


@pytest.fixture(scope="module")
def orch(spark):
    return WorkflowOrchestrator(
        spark, _executors(), global_config={"timeout": {"seconds": 30}}
    )


def test_linear_workflow_end_to_end(orch, spark):
    steps = [
        {"name": "load", "type": "load",
         "config": {"path": "${variables.base}/events.parquet"}},
        {"name": "views", "type": "filter", "input_from": "load",
         "config": {"predicate": "event_type = 'view'"}},
        {"name": "by_user", "type": "agg", "input_from": "views",
         "config": {"key": "user_id"}},
    ]
    res = orch.run(steps, variables={"base": SF})
    assert [res[n].status for n in ("load", "views", "by_user")] == ["completed"] * 3
    expect = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter("event_type = 'view'").select("user_id").distinct().count()
    )
    assert res["by_user"].n_rows == expect


def test_skip_if_on_upstream_aggregate(orch):
    steps = [
        {"name": "load", "type": "load", "config": {"path": f"{SF}/events.parquet"}},
        {"name": "none", "type": "filter", "input_from": "load",
         "config": {"predicate": "event_id < 0"}},
        {"name": "post", "type": "agg", "input_from": "none",
         "skip_if": "{{none.count}} == 0", "config": {"key": "user_id"}},
    ]
    res = orch.run(steps)
    assert res["none"].status == "completed" and res["none"].n_rows == 0
    assert res["post"].status == "skipped"


def test_run_only_if_gate(orch):
    steps = [
        {"name": "load", "type": "load", "config": {"path": f"{SF}/events.parquet"}},
        {"name": "gated", "type": "agg", "input_from": "load",
         "run_only_if": "{{load.count}} > 999999", "config": {"key": "user_id"}},
    ]
    res = orch.run(steps)
    assert res["gated"].status == "skipped"


def test_failure_skips_downstream(orch):
    steps = [
        {"name": "bad", "type": "boom"},
        {"name": "after", "type": "agg", "input_from": "bad", "config": {"key": "x"}},
    ]
    res = orch.run(steps)
    assert res["bad"].status == "failed" and "exploded" in res["bad"].error
    assert res["after"].status == "skipped"
    assert "bad" in res["after"].error


def test_unknown_executor_fails_cleanly(orch):
    res = orch.run([{"name": "x", "type": "nope"}])
    assert res["x"].status == "failed" and "no executor" in res["x"].error


def test_config_deep_merge():
    g = {"timeout": {"seconds": 30, "connect": 5}, "rate_limit": {"rps": 2, "burst": 10}}
    s = {"rate_limit": {"rps": 0.5}, "selector": "a.detail"}
    out = merge_config(g, s)
    assert out["rate_limit"] == {"rps": 0.5, "burst": 10}   # deep-merged
    assert out["timeout"] == {"seconds": 30, "connect": 5}  # inherited
    assert out["selector"] == "a.detail"
    # non-policy dicts replace wholesale
    out2 = merge_config({"meta": {"a": 1}}, {"meta": {"b": 2}})
    assert out2["meta"] == {"b": 2}
