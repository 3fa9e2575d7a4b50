"""W6 step I/O validation — semantic checks ported (values, not code) from
the reference's step_validator.py pydantic models."""

import pytest

from crawler_spark.kernels.stepvalidate import (
    StepValidationError,
    seed_url,
    url_list,
    validate_input,
    validate_output,
    validate_required_fields,
)


class TestInputValidation:
    def test_crawl_valid_string_and_list(self):
        assert validate_input("s", "crawl", {"url": "https://a.go.id"}) == []
        assert validate_input("s", "crawl", {"url": ["https://a.go.id", ""]}) == []
        # only the FIRST list element matters for crawl (seed semantics)

    def test_crawl_invalid(self):
        with pytest.raises(StepValidationError):
            validate_input("s", "crawl", {"url": "  "})
        with pytest.raises(StepValidationError):
            validate_input("s", "crawl", {"url": []})
        with pytest.raises(StepValidationError):
            validate_input("s", "crawl", {"url": [42]})
        with pytest.raises(StepValidationError):
            validate_input("s", "crawl", {})

    def test_scrape_all_elements_checked(self):
        assert validate_input("s", "scrape", {"urls": ["https://a", "https://b"]}) == []
        with pytest.raises(StepValidationError) as ei:
            validate_input("s", "scrape", {"urls": ["https://a", "", 7]})
        msg = str(ei.value)
        assert "index 1" in msg and "index 2" in msg  # every error collected

    def test_non_strict_returns_errors(self):
        errs = validate_input("s", "scrape", {"urls": []}, strict=False)
        assert errs == ["URL list cannot be empty"]

    def test_seed_and_list_accessors(self):
        assert seed_url({"url": "https://a"}) == "https://a"
        assert seed_url({"url": ["https://a", "https://b"]}) == "https://a"
        assert url_list({"urls": "https://a"}) == ["https://a"]
        assert url_list({"urls": ["https://a", "https://b"]}) == ["https://a", "https://b"]


class TestOutputValidation:
    def test_crawl_requires_nonempty_extraction(self):
        assert validate_output("s", "crawl", {"extracted_data": {"urls": []}}) == []
        errs = validate_output("s", "crawl", {"extracted_data": {}})
        assert errs == ["Crawl step must extract at least one field"]
        with pytest.raises(StepValidationError):
            validate_output("s", "crawl", {"extracted_data": {}}, strict=True)

    def test_scrape_items_must_be_list(self):
        assert validate_output("s", "scrape", {"extracted_data": {"items": []}}) == []
        errs = validate_output("s", "scrape", {"extracted_data": {"items": "x"}})
        assert errs == ["'items' field must be a list"]

    def test_scrape_statistics_checked_only_when_all_present(self):
        meta = {"total_urls": 3, "successful_urls": 2, "failed_urls": 1}
        assert validate_output(
            "s", "scrape", {"extracted_data": {}, "metadata": meta}
        ) == []
        bad = dict(meta, failed_urls=-1)
        errs = validate_output("s", "scrape", {"extracted_data": {}, "metadata": bad})
        assert errs == ["Metadata field 'failed_urls' must be a non-negative integer"]
        # partial statistics are optional -> unchecked
        assert validate_output(
            "s", "scrape", {"extracted_data": {}, "metadata": {"total_urls": -5}}
        ) == []

    def test_metadata_must_be_dict(self):
        errs = validate_output("s", "crawl", {"extracted_data": {"a": 1}, "metadata": 3})
        assert errs == ["Metadata must be a dictionary"]


def test_required_fields_reporting():
    assert validate_required_fields("s", "crawl", {"urls": [1]}) == []
    assert validate_required_fields(
        "s", "scrape", {"title": "x"}, required_fields=["title", "price"]
    ) == ["price"]


class TestOrchestratorWiring:
    def test_strict_input_failure_fails_step_and_skips_downstream(self, spark):
        from crawler_spark.engine.orchestrator import WorkflowOrchestrator

        def exec_ok(sp, cfg, inputs):
            return sp.range(3)

        orch = WorkflowOrchestrator(spark, {"crawl": exec_ok, "scrape": exec_ok})
        steps = [
            {"name": "a", "type": "crawl", "input": {"url": "   "}},
            {"name": "b", "type": "scrape", "input": {"urls": ["ok"]},
             "input_from": "a"},
        ]
        res = orch.run(steps)
        assert res["a"].status == "failed" and "empty" in res["a"].error
        assert res["b"].status == "skipped"

    def test_warn_mode_records_and_proceeds(self, spark):
        from crawler_spark.engine.orchestrator import WorkflowOrchestrator

        def exec_ok(sp, cfg, inputs):
            return sp.range(2)

        orch = WorkflowOrchestrator(spark, {"scrape": exec_ok})
        steps = [
            {"name": "a", "type": "scrape", "input": {"urls": []},
             "config": {"strict_validation": False}},
        ]
        res = orch.run(steps)
        assert res["a"].status == "completed"
        assert res["a"].warnings == ["URL list cannot be empty"]
