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

            skip_if = step.get("skip_if")
            if skip_if and evaluate_condition(skip_if, step_aggs):
                results[name] = StepResult(name, "skipped")
                step_aggs[name] = {"skipped": True}
                continue
            run_only_if = step.get("run_only_if")
            if run_only_if and not evaluate_condition(run_only_if, step_aggs):
                results[name] = StepResult(name, "skipped")
                step_aggs[name] = {"skipped": True}
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
            inputs = {d: results[d].df for d in deps if results[d].df is not None}
            try:
                df = executor(self.spark, cfg, inputs)
                n = df.count() if collect_counts else None
                res = StepResult(name, "completed", df=df, n_rows=n,
                                 warnings=input_warnings)
                # W5: small aggregates (not data!) feed downstream conditions
                res.aggregates = {"count": n, "success": (n or 0) > 0}
                results[name] = res
                step_aggs[name] = res.aggregates
            except Exception as e:  # noqa: BLE001 — step errors are data
                results[name] = StepResult(name, "failed", error=str(e)[:500])
        return results
