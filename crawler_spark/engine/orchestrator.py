"""Workflow orchestration over Spark steps (W3 + W4 + W5, SURVEY.md §2.7).

The reference's StepOrchestrator (`step_orchestrator.py:122-352,583-676`)
walks a validated step DAG, resolves each step's input from prior results,
evaluates skip/run conditions, dispatches to an executor, and stores results
in the execution context. Here each step is ONE Spark DataFrame job:

  * plan: W1 dependency graph + W2 toposort (kernels.workflow);
  * per step: ${...} variable substitution over the step config (X8),
    skip_if / run_only_if gating against collected upstream aggregates (X9),
    W4 config merge (global ⊕ step), executor dispatch by step type;
  * "pass data between steps" = the upstream step's DataFrame (lazy — a
    multi-step workflow composes into one Catalyst plan unless a step
    materializes), while CONDITIONS consume only small collected aggregates;
  * W5 result aggregation: success = any row produced, per-step row counts.

Executors are pluggable callables `(spark, cfg, inputs: dict[str, DataFrame])
-> DataFrame` registered by step type — the crawl/scrape/http executors of
the engine plug in here; tests register synthetic ones.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from crawler_spark.kernels.stepvalidate import StepValidationError, validate_input
from crawler_spark.kernels.workflow import (
    build_dependency_graph,
    evaluate_condition,
    merge_config,
    substitute_variables,
    topological_order,
)

Executor = Callable[[SparkSession, dict, dict[str, DataFrame]], DataFrame]


@dataclass
class StepResult:
    name: str
    status: str                      # completed | skipped | failed
    df: DataFrame | None = None
    n_rows: int | None = None
    error: str | None = None
    aggregates: dict[str, Any] = field(default_factory=dict)
    warnings: list[str] = field(default_factory=list)
    metadata: dict[str, Any] = field(default_factory=dict)


def timeout_for_step(step_type: str, cfg: dict) -> float:
    """Timeout selection ladder (step_orchestrator.py:544-581): a scalar
    `timeout` is used directly (legacy format); a dict selects `page_load`
    for browser steps and `http_request` for everything else; default 30 s
    either way."""
    tc = cfg.get("timeout", {})
    if isinstance(tc, bool):  # guard: True is an int in Python
        return 30.0
    if isinstance(tc, (int, float)):
        return float(tc)
    if not isinstance(tc, dict):
        return 30.0
    key = "page_load" if step_type == "browser" else "http_request"
    v = tc.get(key, 30)
    return float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else 30.0


class StepTimeoutError(TimeoutError):
    pass


def _run_with_timeout(spark: SparkSession, fn, timeout_s: float, group: str):
    """Run fn() under a wall-clock budget. The worker thread tags its Spark
    jobs with a job group; on expiry the group is cancelled (kills running
    stages cluster-side — asyncio.wait_for's moral equivalent for a blocking
    Spark action) and StepTimeoutError is raised. The abandoned thread is a
    daemon: it dies with its cancelled jobs."""
    box: dict[str, Any] = {}

    def worker():
        try:
            spark.sparkContext.setJobGroup(group, "orchestrator step", True)
            box["result"] = fn()
        except Exception as e:  # noqa: BLE001 — surfaced to the caller
            box["error"] = e

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        spark.sparkContext.cancelJobGroup(group)
        raise StepTimeoutError
    if "error" in box:
        raise box["error"]
    return box.get("result")


class WorkflowOrchestrator:
    def __init__(
        self,
        spark: SparkSession,
        executors: dict[str, Executor],
        global_config: dict | None = None,
    ):
        self.spark = spark
        self.executors = executors
        self.global_config = global_config or {}

    def run(
        self,
        steps: list[dict],
        variables: dict[str, Any] | None = None,
        collect_counts: bool = True,
    ) -> dict[str, StepResult]:
        """Execute a workflow; returns per-step results in execution order.

        Step dict: {name, type, config?, input_from?, skip_if?, run_only_if?}.
        Failure policy mirrors the reference: a failed/skipped dependency
        skips downstream steps (they report status='skipped')."""
        graph = build_dependency_graph(steps)
        order = topological_order(graph)
        by_name = {s["name"]: s for s in steps}
        context: dict[str, Any] = {"variables": variables or {}}
        results: dict[str, StepResult] = {}
        step_aggs: dict[str, Any] = {}

        for name in order:
            step = by_name[name]
            deps = graph[name]
            bad = [d for d in deps if results[d].status != "completed"]
            if bad:
                results[name] = StepResult(name, "skipped",
                                           error=f"upstream not completed: {bad}")
                continue

            # condition evaluation inside the per-step error boundary: a
            # malformed condition (unquoted YAML -> dict/int) fails THAT
            # step, not the whole run (condition_evaluator.py:90-120 logs
            # and continues; ConditionError from the kernel is already
            # don't-skip, so only truly broken expressions land here)
            try:
                skip_if = step.get("skip_if")
                if skip_if and evaluate_condition(skip_if, step_aggs):
                    results[name] = StepResult(name, "skipped")
                    step_aggs[name] = {"skipped": True}
                    continue
                run_only_if = step.get("run_only_if")
                if run_only_if and not evaluate_condition(
                    run_only_if, step_aggs
                ):
                    results[name] = StepResult(name, "skipped")
                    step_aggs[name] = {"skipped": True}
                    continue
            except Exception as e:  # noqa: BLE001 — condition errors are data
                results[name] = StepResult(
                    name, "failed", error=f"condition error: {e}"[:500]
                )
                continue

            cfg = merge_config(self.global_config, step.get("config", {}))
            cfg = substitute_variables(cfg, context, strict=False)
            # W6 semantic input validation (step_validator.py:215-283):
            # strict (default) fails the step; warn mode records and proceeds
            input_warnings: list[str] = []
            inp = step.get("input")
            if inp is not None and step.get("type") in ("crawl", "scrape"):
                try:
                    input_warnings = validate_input(
                        name, step["type"], inp,
                        strict=cfg.get("strict_validation", True),
                    )
                except StepValidationError as e:
                    results[name] = StepResult(name, "failed", error=str(e)[:500])
                    continue
            executor = self.executors.get(step.get("type", ""))
            if executor is None:
                results[name] = StepResult(
                    name, "failed", error=f"no executor for type {step.get('type')!r}"
                )
                continue
            # DATA inputs come only from input_from (the reference resolves
            # step data solely from input_from, step_orchestrator.py:459) —
            # graph deps also include condition {{refs}}, which gate
            # execution but must NOT inject their DataFrames into the
            # executor. List order (not set order) keeps multi-input
            # executors deterministic.
            input_from = step.get("input_from")
            data_deps = (
                [input_from]
                if isinstance(input_from, str)
                else list(input_from or [])
            )
            inputs = {
                d: results[d].df
                for d in data_deps
                if d in results and results[d].df is not None
            }
            # per-step timeout enforcement + timing metadata
            # (step_orchestrator.py:246-292): the timed region covers both
            # plan construction and the materializing count
            timeout_s = timeout_for_step(step.get("type", ""), cfg)
            t0 = time.time()
            try:
                df, n = _run_with_timeout(
                    self.spark,
                    lambda: (lambda d: (d, d.count() if collect_counts else None))(
                        executor(self.spark, cfg, inputs)
                    ),
                    timeout_s,
                    f"step:{name}:{t0}",
                )
                res = StepResult(name, "completed", df=df, n_rows=n,
                                 warnings=input_warnings)
                res.metadata = {
                    "execution_time_seconds": round(time.time() - t0, 3),
                    "timeout_configured": timeout_s,
                }
                # W5: small aggregates (not data!) feed downstream
                # conditions. With collect_counts=False there is no count to
                # gate on: success reflects COMPLETION (the step ran), and
                # count stays None so a condition referencing it surfaces as
                # a condition error rather than silently comparing None
                res.aggregates = {
                    "count": n,
                    "success": (n or 0) > 0 if collect_counts else True,
                }
                results[name] = res
                step_aggs[name] = res.aggregates
            except StepTimeoutError:
                results[name] = StepResult(
                    name, "failed",
                    error=f"Step execution timeout after {timeout_s}s",
                    metadata={
                        "timeout": True,
                        "timeout_seconds": timeout_s,
                        "execution_time_seconds": round(time.time() - t0, 3),
                    },
                )
            except Exception as e:  # noqa: BLE001 — step errors are data
                results[name] = StepResult(name, "failed", error=str(e)[:500])
        return results
