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


class TestStepTimeouts:
    """Per-step timeout enforcement (reference step_orchestrator.py:246-292,
    544-581 and tests/unit/test_step_timeout.py scenarios)."""

    def test_timeout_enforcement_fails_step(self, spark):
        import time as _t

        from crawler_spark.engine.orchestrator import WorkflowOrchestrator

        def slow(sp, cfg, inputs):
            _t.sleep(3)
            return sp.range(1)

        orch = WorkflowOrchestrator(spark, {"slow": slow})
        out = orch.run([{"name": "s1", "type": "slow", "config": {"timeout": 1}}])
        r = out["s1"]
        assert r.status == "failed"
        assert r.error == "Step execution timeout after 1.0s"
        assert r.metadata["timeout"] is True
        assert r.metadata["timeout_seconds"] == 1.0
        assert r.metadata["execution_time_seconds"] >= 1.0

    def test_completion_records_timing_metadata(self, spark):
        from crawler_spark.engine.orchestrator import WorkflowOrchestrator

        orch = WorkflowOrchestrator(spark, {"fast": lambda sp, c, i: sp.range(5)})
        out = orch.run([{"name": "s1", "type": "fast"}])
        r = out["s1"]
        assert r.status == "completed" and r.n_rows == 5
        assert r.metadata["timeout_configured"] == 30.0  # default applied
        assert isinstance(r.metadata["execution_time_seconds"], float)
        assert r.metadata["execution_time_seconds"] == round(
            r.metadata["execution_time_seconds"], 3
        )

    def test_downstream_skipped_after_timeout(self, spark):
        import time as _t

        from crawler_spark.engine.orchestrator import WorkflowOrchestrator

        def slow(sp, cfg, inputs):
            _t.sleep(3)
            return sp.range(1)

        orch = WorkflowOrchestrator(
            spark, {"slow": slow, "fast": lambda sp, c, i: sp.range(2)}
        )
        out = orch.run([
            {"name": "a", "type": "slow", "config": {"timeout": 1}},
            {"name": "b", "type": "fast", "input_from": "a"},
        ])
        assert out["a"].status == "failed"
        assert out["b"].status == "skipped"

    def test_global_timeout_override_via_config_merge(self, spark):
        import time as _t

        from crawler_spark.engine.orchestrator import WorkflowOrchestrator

        def slow(sp, cfg, inputs):
            _t.sleep(2.5)
            return sp.range(1)

        orch = WorkflowOrchestrator(spark, {"slow": slow}, global_config={"timeout": 1})
        out = orch.run([{"name": "s1", "type": "slow"}])
        assert out["s1"].status == "failed"
        assert out["s1"].metadata["timeout_seconds"] == 1.0

    def test_timeout_selector_ladder(self):
        from crawler_spark.engine.orchestrator import timeout_for_step

        assert timeout_for_step("http", {}) == 30.0
        assert timeout_for_step("http", {"timeout": 12}) == 12.0  # legacy scalar
        assert timeout_for_step("http", {"timeout": {"http_request": 7}}) == 7.0
        assert timeout_for_step("browser", {"timeout": {"page_load": 9}}) == 9.0
        assert timeout_for_step("browser", {"timeout": {"http_request": 7}}) == 30.0
        assert timeout_for_step("crawl", {"timeout": {"http_request": 5, "page_load": 9}}) == 5.0
        assert timeout_for_step("http", {"timeout": "bogus"}) == 30.0


class TestReviewRegressions:
    """Round-3 review findings on the orchestrator (fixed + gated here)."""

    def test_condition_ref_does_not_inject_data_input(self, orch):
        """A run_only_if {{ref}} to another step gates execution but must
        NOT add that step's DataFrame to the executor inputs — the
        reference resolves data solely from input_from
        (step_orchestrator.py:459); single-input executors would crash on
        the extra frame."""
        steps = [
            {"name": "a", "type": "load",
             "config": {"path": f"{SF}/events.parquet"}},
            {"name": "b", "type": "load",
             "config": {"path": f"{SF}/documents.parquet"}},
            {"name": "c", "type": "filter", "input_from": "a",
             "run_only_if": "{{b.count}} > 0",
             "config": {"predicate": "event_type = 'view'"}},
        ]
        res = orch.run(steps)
        assert res["c"].status == "completed"
        assert res["c"].n_rows > 0

    def test_malformed_condition_fails_only_that_step(self, orch):
        """An unquoted-YAML condition (non-string) fails THAT step and the
        run continues (condition_evaluator.py:90-120 logs and continues) —
        previously it aborted the whole run."""
        steps = [
            {"name": "a", "type": "load",
             "config": {"path": f"{SF}/events.parquet"}},
            {"name": "bad", "type": "filter", "input_from": "a",
             "skip_if": {"not": "a string"},
             "config": {"predicate": "event_type = 'view'"}},
            {"name": "fine", "type": "filter", "input_from": "a",
             "config": {"predicate": "event_type = 'click'"}},
        ]
        res = orch.run(steps)
        assert res["bad"].status == "failed"
        assert "condition error" in res["bad"].error
        assert res["fine"].status == "completed"

    def test_collect_counts_false_success_gate(self, spark):
        """With collect_counts=False a completed step still gates
        {{step.success}} == true downstream (previously success was
        hard-False and the gate inverted)."""
        orch2 = WorkflowOrchestrator(spark, _executors())
        steps = [
            {"name": "a", "type": "load",
             "config": {"path": f"{SF}/events.parquet"}},
            {"name": "b", "type": "filter", "input_from": "a",
             "run_only_if": "{{a.success}} == true",
             "config": {"predicate": "event_type = 'view'"}},
        ]
        res = orch2.run(steps, collect_counts=False)
        assert res["a"].status == "completed"
        assert res["b"].status == "completed"
