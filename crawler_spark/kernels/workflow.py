"""Workflow DAG kernels (W1-W2, X8, X9 in SURVEY.md §2.7/§2.6).

Driver-side orchestration logic — workflows are ~10 steps, so these stay
plain Python (the reference runs them in-process too):

  * dependency graph + Kahn toposort + cycle reporting
    (reference: crawler/services/dependency_validator.py:63-269)
  * ${...} variable substitution with recursion limit + cycle detection
    (crawler/utils/variable_substitution.py — 781 LoC file, regex core)
  * step skip/run conditions over {{step.field}} refs
    (crawler/services/condition_evaluator.py:21-120)

Each Spark stage executes one workflow step; `execution_order` decides stage
order and `evaluate_condition` gates stage submission on collected aggregates.
"""

from __future__ import annotations

import re
from typing import Any

_REF_RE = re.compile(r"\{\{\s*([\w.]+)\s*\}\}")
_VAR_RE = re.compile(r"\$\{(\w+)(?:\.([^}]*))?\}")
_ESCAPE_RE = re.compile(r"\\\$\{([^}]+)\}")  # \${literal} -> ${literal}


# ------------------------------------------------------------------ W1 + W2

class WorkflowValidationError(ValueError):
    pass


def build_dependency_graph(steps: list[dict]) -> dict[str, set[str]]:
    """step name -> set of upstream step names. Edges from `input_from` plus
    every {{step.field}} reference in skip_if / run_only_if. Raises on
    duplicate names and missing dependencies."""
    names = [s["name"] for s in steps]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise WorkflowValidationError(f"duplicate step names: {sorted(dupes)}")
    known = set(names)
    graph: dict[str, set[str]] = {n: set() for n in names}
    for s in steps:
        deps: set[str] = set()
        src = s.get("input_from")
        if src:
            deps.update([src] if isinstance(src, str) else src)
        for key in ("skip_if", "run_only_if"):
            cond = s.get(key)
            if cond:
                for m in _REF_RE.finditer(str(cond)):
                    deps.add(m.group(1).split(".")[0])
        missing = deps - known
        if missing:
            raise WorkflowValidationError(
                f"step '{s['name']}' depends on unknown step(s): {sorted(missing)}"
            )
        graph[s["name"]] = deps - {s["name"]}
    return graph


def topological_order(graph: dict[str, set[str]]) -> list[str]:
    """Kahn's algorithm; deterministic (lexicographic among ready nodes).
    On a cycle, raises with one concrete cycle path (DFS-found)."""
    indeg = {n: len(d) for n, d in graph.items()}
    children: dict[str, set[str]] = {n: set() for n in graph}
    for n, deps in graph.items():
        for d in deps:
            children[d].add(n)
    ready = sorted(n for n, k in indeg.items() if k == 0)
    order: list[str] = []
    while ready:
        n = ready.pop(0)
        order.append(n)
        for c in sorted(children[n]):
            indeg[c] -= 1
            if indeg[c] == 0:
                ready.append(c)
        ready.sort()
    if len(order) != len(graph):
        raise WorkflowValidationError(f"dependency cycle: {' -> '.join(_find_cycle(graph))}")
    return order


def _find_cycle(graph: dict[str, set[str]]) -> list[str]:
    WHITE, GRAY, BLACK = 0, 1, 2
    color = dict.fromkeys(graph, WHITE)
    stack: list[str] = []

    def dfs(n: str) -> list[str] | None:
        color[n] = GRAY
        stack.append(n)
        for d in sorted(graph[n]):
            if color[d] == GRAY:
                return stack[stack.index(d):] + [d]
            if color[d] == WHITE:
                found = dfs(d)
                if found:
                    return found
        stack.pop()
        color[n] = BLACK
        return None

    for n in sorted(graph):
        if color[n] == WHITE:
            cyc = dfs(n)
            if cyc:
                return cyc
    return []


# ----------------------------------------------------------------------- W4

_DEEP_MERGE_KEYS = {"rate_limit", "timeout", "retry", "headers"}


def merge_config(global_cfg: dict, step_cfg: dict) -> dict:
    """Global ⊕ step config (step wins), with one-level deep-merge for the
    nested policy sections (step_orchestrator.py:626-676 semantics): a step
    overriding rate_limit.rps keeps the global rate_limit.burst."""
    out = dict(global_cfg)
    for k, v in step_cfg.items():
        if (
            k in _DEEP_MERGE_KEYS
            and isinstance(v, dict)
            and isinstance(out.get(k), dict)
        ):
            out[k] = {**out[k], **v}
        else:
            out[k] = v
    return out


# ----------------------------------------------------------------------- X8

class SubstitutionError(ValueError):
    pass


def substitute_variables(
    value: Any,
    context: dict[str, Any],
    strict: bool = True,
    max_depth: int = 10,
) -> Any:
    """${namespace.path} substitution over strings/dicts/lists.

    Namespaces are the context's top-level keys (variables / ENV / input /
    pagination / metadata ... — reference's resolver set). A string that is
    EXACTLY one ${ref} keeps the referenced value's type; embedded refs
    stringify. Re-substitutes up to max_depth times for nested refs; raises
    on depth exhaustion (cycle) and, in strict mode, on unknown refs.
    """
    if isinstance(value, dict):
        return {k: substitute_variables(v, context, strict, max_depth) for k, v in value.items()}
    if isinstance(value, list):
        return [substitute_variables(v, context, strict, max_depth) for v in value]
    if not isinstance(value, str):
        return value

    # \${...} escapes a literal reference (variable_substitution.py:36,380-457
    # semantics): shelve each escape behind a placeholder, substitute, then
    # restore WITHOUT the backslash.
    escaped: dict[str, str] = {}

    def _shelve(mm: re.Match) -> str:
        ph = f"\x00ESC{len(escaped)}\x00"
        escaped[ph] = "${" + mm.group(1) + "}"
        return ph

    cur: Any = _ESCAPE_RE.sub(_shelve, value)

    def _restore(v: Any) -> Any:
        if escaped and isinstance(v, str):
            for ph, lit in escaped.items():
                v = v.replace(ph, lit)
        return v

    for _ in range(max_depth):
        if not isinstance(cur, str) or not _VAR_RE.search(cur):
            return _restore(cur)
        prev = cur
        m = _VAR_RE.fullmatch(cur)
        if m:  # whole-string ref: preserve type
            cur = _resolve(m, context, strict, cur)
        else:
            cur = _VAR_RE.sub(
                lambda mm: str(_resolve(mm, context, strict, mm.group(0))), cur
            )
        if cur == prev:  # lenient mode left unresolved refs in place
            return _restore(cur)
    if isinstance(cur, str) and _VAR_RE.search(cur):
        raise SubstitutionError(f"substitution depth exceeded (cycle?): {value!r}")
    return _restore(cur)


def _resolve(m: re.Match, context: dict[str, Any], strict: bool, fallback: str) -> Any:
    ns, path = m.group(1), m.group(2)
    node: Any = context.get(ns, _MISSING)
    if node is _MISSING:
        if strict:
            raise SubstitutionError(f"unknown namespace: {ns!r}")
        return fallback
    if path:
        for part in path.split("."):
            if isinstance(node, dict) and part in node:
                node = node[part]
            elif isinstance(node, list) and part.isdigit() and int(part) < len(node):
                node = node[int(part)]
            else:
                if strict:
                    raise SubstitutionError(f"unresolvable path: {ns}.{path}")
                return fallback
    return node


_MISSING = object()


# ----------------------------------------------------------------------- X9

_OPS = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">=": lambda a, b: _num(a) >= _num(b),
    "<=": lambda a, b: _num(a) <= _num(b),
    ">": lambda a, b: _num(a) > _num(b),
    "<": lambda a, b: _num(a) < _num(b),
}


def _num(v: Any) -> float:
    if isinstance(v, bool):
        return float(v)
    try:
        return float(v)
    except (TypeError, ValueError):
        raise ConditionError(f"non-numeric operand: {v!r}")


class ConditionError(ValueError):
    pass


def evaluate_condition(expr: str, step_results: dict[str, Any]) -> bool:
    """`{{step.field}} OP literal`, `exists {{ref}}`, `empty {{ref}}`,
    `!empty {{ref}}`. Evaluation errors return False (the reference logs and
    does NOT skip on error — condition_evaluator.py:90-120)."""
    try:
        expr = expr.strip()
        for prefix, fn in (
            ("!empty", lambda v: not _is_empty(v)),
            ("empty", _is_empty),
            ("exists", lambda v: v is not _MISSING and v is not None),
        ):
            if expr.lower().startswith(prefix + " ") or expr.lower().startswith(prefix + "{{"):
                ref = expr[len(prefix):].strip()
                return fn(_deref(ref, step_results, allow_missing=True))
        # binary comparison: longest operator first
        for op in ("==", "!=", ">=", "<=", ">", "<"):
            if op in expr:
                lhs, rhs = expr.split(op, 1)
                lv = _deref(lhs.strip(), step_results)
                rv = _literal(rhs.strip())
                return _OPS[op](lv, rv)
        raise ConditionError(f"no operator in condition: {expr!r}")
    except ConditionError:
        return False


def _is_empty(v: Any) -> bool:
    if v is _MISSING or v is None:
        return True
    if isinstance(v, (str, list, dict)):
        return len(v) == 0
    return False


def _deref(token: str, results: dict[str, Any], allow_missing: bool = False) -> Any:
    m = _REF_RE.fullmatch(token)
    if not m:
        return _literal(token)
    node: Any = results
    for part in m.group(1).split("."):
        if isinstance(node, dict) and part in node:
            node = node[part]
        else:
            if allow_missing:
                return _MISSING
            raise ConditionError(f"unresolvable ref: {token}")
    return node


def _literal(tok: str) -> Any:
    t = tok.strip().strip("'\"")
    if t.lower() in ("true", "false"):
        return t.lower() == "true"
    try:
        return int(t)
    except ValueError:
        pass
    try:
        return float(t)
    except ValueError:
        pass
    return t
