"""W1/W2 DAG validation, X8 variable substitution, X9 condition evaluation.

Case shapes mirror the reference's tests (test_dependency_validator.py,
test_variable_substitution, condition_evaluator tests) without copying code.
"""

import pytest

from crawler_spark.kernels.workflow import (
    ConditionError,
    SubstitutionError,
    WorkflowValidationError,
    build_dependency_graph,
    evaluate_condition,
    substitute_variables,
    topological_order,
)


class TestDependencyGraph:
    def test_linear_chain(self):
        steps = [
            {"name": "a"},
            {"name": "b", "input_from": "a"},
            {"name": "c", "input_from": "b"},
        ]
        g = build_dependency_graph(steps)
        assert topological_order(g) == ["a", "b", "c"]

    def test_condition_refs_create_edges(self):
        steps = [
            {"name": "fetch"},
            {"name": "parse", "skip_if": "{{fetch.count}} == 0"},
        ]
        g = build_dependency_graph(steps)
        assert g["parse"] == {"fetch"}

    def test_duplicate_names_error(self):
        with pytest.raises(WorkflowValidationError, match="duplicate"):
            build_dependency_graph([{"name": "a"}, {"name": "a"}])

    def test_missing_dependency_error(self):
        with pytest.raises(WorkflowValidationError, match="unknown step"):
            build_dependency_graph([{"name": "b", "input_from": "ghost"}])

    def test_cycle_reported_with_path(self):
        steps = [
            {"name": "a", "input_from": "c"},
            {"name": "b", "input_from": "a"},
            {"name": "c", "input_from": "b"},
        ]
        g = build_dependency_graph(steps)
        with pytest.raises(WorkflowValidationError, match="cycle.*a.*->"):
            topological_order(g)

    def test_diamond_deterministic_order(self):
        steps = [
            {"name": "d", "input_from": ["b", "c"]},
            {"name": "b", "input_from": "a"},
            {"name": "c", "input_from": "a"},
            {"name": "a"},
        ]
        assert topological_order(build_dependency_graph(steps)) == ["a", "b", "c", "d"]


class TestVariableSubstitution:
    CTX = {
        "variables": {"base": "https://x.go.id", "depth": 3},
        "ENV": {"TOKEN": "abc"},
        "input": {"url": "${variables.base}/start"},
        "pagination": {"current_page": 2},
    }

    def test_embedded_stringifies(self):
        assert (
            substitute_variables("${variables.base}/p?page=${pagination.current_page}", self.CTX)
            == "https://x.go.id/p?page=2"
        )

    def test_whole_ref_preserves_type(self):
        assert substitute_variables("${variables.depth}", self.CTX) == 3

    def test_nested_resolution(self):
        assert substitute_variables("${input.url}", self.CTX) == "https://x.go.id/start"

    def test_containers_recursed(self):
        out = substitute_variables(
            {"u": ["${ENV.TOKEN}", {"d": "${variables.depth}"}]}, self.CTX
        )
        assert out == {"u": ["abc", {"d": 3}]}

    def test_strict_unknown_raises(self):
        with pytest.raises(SubstitutionError):
            substitute_variables("${nope.x}", self.CTX)

    def test_lenient_keeps_original(self):
        assert substitute_variables("${nope.x}", self.CTX, strict=False) == "${nope.x}"

    def test_cycle_detected(self):
        ctx = {"variables": {"a": "${variables.b}", "b": "${variables.a}"}}
        with pytest.raises(SubstitutionError, match="depth"):
            substitute_variables("${variables.a}", ctx)


class TestConditionEvaluator:
    RESULTS = {"fetch": {"count": 5, "items": [], "url": "https://x", "ok": True}}

    @pytest.mark.parametrize(
        "expr,expected",
        [
            ("{{fetch.count}} == 5", True),
            ("{{fetch.count}} != 5", False),
            ("{{fetch.count}} > 3", True),
            ("{{fetch.count}} <= 4", False),
            ("{{fetch.ok}} == true", True),
            ("{{fetch.url}} == 'https://x'", True),
            ("exists {{fetch.count}}", True),
            ("exists {{fetch.missing}}", False),
            ("empty {{fetch.items}}", True),
            ("!empty {{fetch.items}}", False),
            ("!empty {{fetch.url}}", True),
        ],
    )
    def test_cases(self, expr, expected):
        assert evaluate_condition(expr, self.RESULTS) is expected

    def test_error_returns_false(self):
        # unresolvable ref / malformed expr -> False (don't skip on error)
        assert evaluate_condition("{{ghost.x}} == 1", self.RESULTS) is False
        assert evaluate_condition("no operator here", self.RESULTS) is False
        assert evaluate_condition("{{fetch.url}} > 3", self.RESULTS) is False


class TestEscapedReferences:
    """\\${...} shelving semantics (reference variable_substitution.py:36,380-457):
    escaped refs survive substitution literally, with the backslash consumed."""

    def test_escape_passes_through_literally(self):
        from crawler_spark.kernels.workflow import substitute_variables

        ctx = {"variables": {"a": "X"}}
        assert substitute_variables(r"use \${variables.a} here", ctx) == "use ${variables.a} here"

    def test_escape_alongside_real_substitution(self):
        from crawler_spark.kernels.workflow import substitute_variables

        ctx = {"variables": {"a": "X"}}
        assert (
            substitute_variables(r"${variables.a} and \${variables.a}", ctx)
            == "X and ${variables.a}"
        )

    def test_whole_string_escape(self):
        from crawler_spark.kernels.workflow import substitute_variables

        assert substitute_variables(r"\${not.a.ref}", {}) == "${not.a.ref}"

    def test_escape_does_not_mask_unknown_ref_error(self):
        import pytest

        from crawler_spark.kernels.workflow import SubstitutionError, substitute_variables

        with pytest.raises(SubstitutionError):
            substitute_variables(r"\${ok} ${missing.ref}", {}, strict=True)

    def test_nested_value_resolves_before_restore(self):
        from crawler_spark.kernels.workflow import substitute_variables

        # the substituted value itself may not re-trigger escapes
        ctx = {"variables": {"a": "${variables.b}", "b": "done"}}
        assert substitute_variables(r"${variables.a}+\${keep}", ctx) == "done+${keep}"
