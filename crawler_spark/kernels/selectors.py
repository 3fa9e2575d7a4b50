"""Config-driven selector extraction (X1/X2/X3/X5 — SURVEY.md §2.6).

The reference's entire crawl-config surface is ``{field: selector}`` maps
executed per page: ``SelectorProcessor.process_selectors``
(`/root/reference/crawler/services/selector_processor.py:34-91`) dispatching
to BeautifulSoup CSS select / lxml XPath
(`html_parser.py:86-189,191-263,265-303`) or dot-path JSON navigation
(`selector_processor.py:179-226`). Neither lxml nor bs4 exists in this
container, so both engines are from-scratch over the stdlib DOM in
kernels/dom.py, reproducing the reference's observable semantics:

  * CSS subset: tag, ``*``, ``.class``, ``#id``, ``[attr]``,
    ``[attr=v]``/``[attr~=v]``/``[attr^=v]``/``[attr$=v]``/``[attr*=v]``/
    ``[attr|=v]`` (quoted or bare values), descendant and ``>`` child
    combinators, ``,`` selector groups; matches in document order.
  * Text extraction = bs4 ``get_text(strip=True)`` (per-node strip, join
    with no separator); attribute extraction skips falsy values
    (html_parser.py:112-129).
  * XPath subset: ``/`` child and ``//`` descendant axes, name/``*`` tests,
    trailing ``text()`` and ``@attr`` steps, ``[@attr]`` and ``[@attr='v']``
    predicates. String results are ``.strip()``-ed; element results use
    lxml's itertext-then-strip (html_parser.py:228-250).
  * Dispatch: selector starting with ``/`` or ``//`` is XPath, else CSS
    (selector_processor.py:228-243); ``result_type`` single -> first-or-None,
    array -> list (html_parser.py:265-303).
  * Per-field errors (bad config, bad selector) -> None, never an exception
    (selector_processor.py:63-91).

Everything here is pure-Python per page; the Spark layer batches it through
one Arrow-vectorized pandas UDF per page (functions/selector_udfs.py) with
one tree build per page shared by all fields — the reference's parse-once
optimization (`url_extractor.py:113`).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Any

from crawler_spark.kernels.dom import (
    Node,
    build_tree,
    iter_elements,
    iter_text_nodes,
    text_bs4,
    text_itertext,
)

# --------------------------------------------------------------------- CSS


@dataclass
class _Compound:
    tag: str | None = None
    id: str | None = None
    classes: list[str] = field(default_factory=list)
    attrs: list[tuple[str, str | None, str | None]] = field(default_factory=list)
    empty: bool = True


_SIMPLE = re.compile(
    r"(?:(?P<tag>[\w-]+|\*)"
    r"|\.(?P<cls>[\w-]+)"
    r"|\#(?P<id>[\w-]+)"
    r"|\[\s*(?P<attr>[\w:-]+)\s*"
    r"(?:(?P<op>[~|^$*]?=)\s*(?P<val>\"[^\"]*\"|'[^']*'|[^\]]*))?\s*\])"
)


class SelectorError(ValueError):
    pass


def _split_groups(s: str) -> list[str]:
    """Split a selector list on top-level commas (not inside [] or quotes)."""
    out: list[str] = []
    cur: list[str] = []
    depth = 0
    quote: str | None = None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
            cur.append(ch)
        elif ch == "[":
            depth += 1
            cur.append(ch)
        elif ch == "]":
            depth = max(0, depth - 1)
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    groups = [g.strip() for g in out]
    if any(not g for g in groups):
        raise SelectorError(f"empty selector in group: {s!r}")
    return groups


def _parse_compound(sel: str, i: int) -> tuple[_Compound, int]:
    comp = _Compound()
    while i < len(sel):
        m = _SIMPLE.match(sel, i)
        if not m:
            break
        if m.group("tag"):
            if not comp.empty:
                raise SelectorError(f"tag must lead the compound: {sel!r}")
            comp.tag = m.group("tag").lower()
        elif m.group("cls"):
            comp.classes.append(m.group("cls"))
        elif m.group("id"):
            comp.id = m.group("id")
        else:
            val = m.group("val")
            if val is not None:
                if len(val) >= 2 and val[0] in "\"'" and val[-1] == val[0]:
                    val = val[1:-1]
                else:
                    val = val.strip()
            comp.attrs.append((m.group("attr").lower(), m.group("op"), val))
        comp.empty = False
        i = m.end()
    if comp.empty:
        raise SelectorError(f"could not parse selector at {sel[i:]!r}")
    return comp, i


@lru_cache(maxsize=512)
def parse_css(selector: str) -> list[list[tuple[str | None, _Compound]]]:
    """-> groups; each group is [(combinator-to-left, compound), ...] where
    combinator is None (first), ' ' (descendant) or '>' (child).

    lru_cached: a config of K selectors over N pages compiles each selector
    once per executor, not N times (matching never mutates the parse)."""
    if not isinstance(selector, str) or not selector.strip():
        raise SelectorError("empty CSS selector")
    groups = []
    for g in _split_groups(selector):
        parts: list[tuple[str | None, _Compound]] = []
        pending: str | None = None
        i, n = 0, len(g)
        while i < n:
            ch = g[i]
            if ch.isspace() or ch in "><+~":
                comb = None
                while i < n and (g[i].isspace() or g[i] in "><+~"):
                    if g[i] in ">+~":
                        if comb is not None:
                            raise SelectorError(f"double combinator in {g!r}")
                        comb = g[i]
                    i += 1
                if not parts and comb is not None:
                    raise SelectorError(f"leading combinator in {g!r}")
                if parts:
                    pending = comb or " "
                continue
            comp, i = _parse_compound(g, i)
            parts.append((pending, comp))
            pending = None
        if pending is not None or not parts:
            raise SelectorError(f"dangling combinator in {g!r}")
        groups.append(parts)
    return groups


def _match_compound(node: Node, c: _Compound) -> bool:
    if c.tag is not None and c.tag != "*" and node.tag != c.tag:
        return False
    if c.id is not None and node.attrs.get("id") != c.id:
        return False
    if c.classes:
        classes = node.attrs.get("class", "").split()
        if any(k not in classes for k in c.classes):
            return False
    for name, op, val in c.attrs:
        have = node.attrs.get(name)
        if have is None:
            return False
        if op is None:
            continue
        if op == "=":
            ok = have == val
        elif op == "~=":
            ok = val in have.split()
        elif op == "^=":
            ok = val != "" and have.startswith(val)
        elif op == "$=":
            ok = val != "" and have.endswith(val)
        elif op == "*=":
            ok = val != "" and val in have
        else:  # |=
            ok = have == val or have.startswith(val + "-")
        if not ok:
            return False
    return True


def _elder_siblings(node: Node):
    """Element siblings strictly before `node`, nearest first."""
    if node.parent is None:
        return
    sibs = [c for c in node.parent.children if isinstance(c, Node)]
    try:
        idx = next(i for i, c in enumerate(sibs) if c is node)
    except StopIteration:
        return
    for c in reversed(sibs[:idx]):
        yield c


def _match_selector(node: Node, parts: list[tuple[str | None, _Compound]]) -> bool:
    comb, comp = parts[-1]
    if not _match_compound(node, comp):
        return False
    if len(parts) == 1:
        return True
    prefix = parts[:-1]
    if comb == ">":
        p = node.parent
        return p is not None and p.tag != "__root__" and _match_selector(p, prefix)
    if comb == "+":  # adjacent sibling
        for sib in _elder_siblings(node):
            return _match_selector(sib, prefix)
        return False
    if comb == "~":  # general preceding sibling
        return any(_match_selector(sib, prefix) for sib in _elder_siblings(node))
    anc = node.parent
    while anc is not None and anc.tag != "__root__":
        if _match_selector(anc, prefix):
            return True
        anc = anc.parent
    return False


def css_select(root: Node, selector: str, select_all: bool = True) -> list[Node]:
    """Document-order matches of a CSS selector group list."""
    groups = parse_css(selector)
    out: list[Node] = []
    for node in iter_elements(root):
        if any(_match_selector(node, g) for g in groups):
            if not select_all:
                return [node]
            out.append(node)
    return out


# -------------------------------------------------------------------- XPath

_XP_TEST = re.compile(r"(@[\w:-]+|text\(\)|\*|[\w:-]+)")
_XP_PRED = re.compile(
    r"^@(?P<attr>[\w:-]+)\s*(?:=\s*(?P<val>\"[^\"]*\"|'[^']*'))?$|^(?P<pos>[1-9]\d*)$"
)


@lru_cache(maxsize=512)
def _parse_xpath(expr: str) -> list[tuple[str, str, list[tuple[str, str | None]]]]:
    """-> [(axis, test, predicates)]; axis '/' child or '//' descendant.
    lru_cached like parse_css."""
    s = expr.strip()
    if not s:
        raise SelectorError("empty XPath")
    if not s.startswith("/"):
        s = "//" + s
    steps = []
    i, n = 0, len(s)
    while i < n:
        if s.startswith("//", i):
            axis, i = "//", i + 2
        elif s[i] == "/":
            axis, i = "/", i + 1
        else:
            raise SelectorError(f"bad XPath at {s[i:]!r}")
        m = _XP_TEST.match(s, i)
        if not m:
            raise SelectorError(f"bad XPath step at {s[i:]!r}")
        test = m.group(1)
        i = m.end()
        preds: list[tuple[str, Any, Any]] = []
        while i < n and s[i] == "[":
            j = s.find("]", i)
            if j < 0:
                raise SelectorError(f"unclosed predicate in {expr!r}")
            pm = _XP_PRED.match(s[i + 1:j].strip())
            if not pm:
                raise SelectorError(f"unsupported predicate {s[i:j+1]!r}")
            if pm.group("pos"):
                preds.append(("pos", int(pm.group("pos")), None))
            else:
                val = pm.group("val")
                preds.append(
                    ("attr", pm.group("attr").lower(), val[1:-1] if val else None)
                )
            i = j + 1
        steps.append((axis, test.lower() if test not in ("text()",) else test, preds))
    return steps


def _attr_pred_ok(node: Node, attr: str, val: str | None) -> bool:
    have = node.attrs.get(attr)
    return have is not None and (val is None or have == val)


def _apply_preds(
    matches: list[Node], preds: list[tuple[str, Any, Any]]
) -> list[Node]:
    """Predicates apply left-to-right over the per-parent candidate list —
    `[@x][1]` = first among @x matches, `[1][@x]` = first match if it has @x
    (lxml/XPath 1.0 semantics)."""
    for kind, a, b in preds:
        if kind == "attr":
            matches = [el for el in matches if _attr_pred_ok(el, a, b)]
        else:  # positional, 1-based within the current candidate list
            matches = [matches[a - 1]] if 0 < a <= len(matches) else []
    return matches


def _tree_root(node: Node) -> Node:
    while node.parent is not None:
        node = node.parent
    return node


def xpath_select(root: Node, expr: str) -> list[Node | str]:
    """Evaluate the XPath subset -> element nodes or strings (text()/@attr),
    document order, deduped."""
    steps = _parse_xpath(expr)
    ctx: list[Node] = [root]
    for si, (axis, test, preds) in enumerate(steps):
        last = si == len(steps) - 1
        if test == "text()" or test.startswith("@"):
            if not last:
                raise SelectorError(f"{test} must be the final step in {expr!r}")
            strings: list[str] = []
            for node in ctx:
                if test == "text()":
                    if axis == "//":
                        strings.extend(iter_text_nodes(node))
                    else:
                        strings.extend(c for c in node.children if isinstance(c, str))
                else:
                    attr = test[1:]
                    nodes = iter_elements(node) if axis == "//" else [node]
                    for el in nodes:
                        if attr in el.attrs:
                            strings.append(el.attrs[attr])
            return strings
        has_pos = any(k == "pos" for k, _, _ in preds)
        nxt: list[Node] = []
        seen: set[int] = set()
        if not has_pos:
            # fast path: flat filter, document order preserved by traversal
            attr_preds = [(a, b) for k, a, b in preds if k == "attr"]
            for node in ctx:
                cands = (
                    iter_elements(node)
                    if axis == "//"
                    else (c for c in node.children if isinstance(c, Node))
                )
                for el in cands:
                    if test != "*" and el.tag != test:
                        continue
                    if any(not _attr_pred_ok(el, a, b) for a, b in attr_preds):
                        continue
                    if id(el) not in seen:
                        seen.add(id(el))
                        nxt.append(el)
        else:
            # positional predicates are evaluated per PARENT group (XPath
            # [n] = n-th matching child of its parent, not n-th overall)
            for node in ctx:
                if axis == "/":
                    groups = [[c for c in node.children if isinstance(c, Node)]]
                else:
                    by_parent: dict[int, list[Node]] = {}
                    order: list[int] = []
                    for el in iter_elements(node):
                        key = id(el.parent)
                        if key not in by_parent:
                            by_parent[key] = []
                            order.append(key)
                        by_parent[key].append(el)
                    groups = [by_parent[k] for k in order]
                for grp in groups:
                    matches = [el for el in grp if test == "*" or el.tag == test]
                    for el in _apply_preds(matches, preds):
                        if id(el) not in seen:
                            seen.add(id(el))
                            nxt.append(el)
            # per-parent grouping can interleave out of document order;
            # restore it with one pass over the tree
            if len(nxt) > 1:
                pos = {
                    id(el): i
                    for i, el in enumerate(iter_elements(_tree_root(nxt[0])))
                }
                nxt.sort(key=lambda el: pos.get(id(el), 0))
        ctx = nxt
    return list(ctx)


# --------------------------------------------------- reference API surface


def apply_css_selector(
    tree: Node, selector: str, attribute: str | None = None, select_all: bool = False
) -> list[str]:
    """html_parser.py:86-147 semantics: text via get_text(strip=True) or an
    attribute value; falsy values skipped; [] on selector errors."""
    try:
        elements = css_select(tree, selector, select_all=select_all)
    except SelectorError:
        return []
    results: list[str] = []
    for el in elements:
        if attribute:
            value = el.attrs.get(attribute)
            if value:
                results.append(str(value))
        else:
            text = text_bs4(el)
            if text:
                results.append(text)
    return results


def apply_xpath(tree: Node, xpath: str, attribute: str | None = None) -> list[str]:
    """html_parser.py:191-263 semantics: string results stripped; element
    results -> attribute or itertext-stripped (dropped when empty)."""
    try:
        elements = xpath_select(tree, xpath)
    except SelectorError:
        return []
    results: list[str] = []
    for el in elements:
        if isinstance(el, str):
            results.append(el.strip())
        else:
            if attribute:
                value = el.attrs.get(attribute)
                if value:
                    results.append(str(value))
            else:
                text_content = "".join(iter_text_nodes(el))
                if text_content:
                    results.append(text_content.strip())
    return results


def detect_selector_type(selector: str) -> str:
    """selector_processor.py:228-243: leading '/' or '//' -> xpath."""
    return "xpath" if selector.startswith("/") else "css"


def extract_data(
    content: str | bytes | Node,
    selector: str,
    attribute: str | None = None,
    selector_type: str = "css",
    result_type: str = "single",
) -> str | list[str] | None:
    """html_parser.py:265-303: unified extract over a string or pre-built
    tree; single -> first-or-None, array -> list."""
    tree = content if isinstance(content, Node) else build_tree(content)
    if selector_type == "xpath":
        results = apply_xpath(tree, selector, attribute)
    else:
        results = apply_css_selector(
            tree, selector, attribute, select_all=(result_type == "array")
        )
    if result_type == "single":
        return results[0] if results else None
    return results


def navigate_json_path(data: Any, path: str) -> Any:
    """selector_processor.py:179-226: dot path with numeric list indices;
    None on any miss."""
    if not path:
        return data
    current = data
    for part in path.split("."):
        if current is None:
            return None
        if isinstance(current, list):
            try:
                index = int(part)
            except (ValueError, TypeError):
                return None
            current = current[index] if 0 <= index < len(current) else None
        elif isinstance(current, dict):
            current = current.get(part)
        else:
            return None
    return current


def _parse_config(selector_config: Any) -> tuple[str, str | None, str]:
    """-> (selector, attribute, result_type); raises on invalid config."""
    if isinstance(selector_config, str):
        return selector_config, None, "single"
    if isinstance(selector_config, dict):
        selector = selector_config.get("selector")
        if not selector or not isinstance(selector, str):
            raise SelectorError("Selector configuration must include 'selector' field")
        return (
            selector,
            selector_config.get("attribute"),
            selector_config.get("type", "single"),
        )
    raise SelectorError(
        f"Invalid selector configuration: {type(selector_config).__name__}"
    )


def process_selectors(
    content: str | bytes | dict | Node, selectors: dict[str, Any]
) -> dict[str, Any]:
    """selector_processor.py:34-91: {field: selector_config} -> {field:
    value}; HTML (str/tree) or JSON (dict) content; per-field error -> None."""
    if not selectors:
        return {}
    is_json = isinstance(content, dict)
    tree: Node | None = None
    if not is_json:
        tree = content if isinstance(content, Node) else build_tree(content)
    extracted: dict[str, Any] = {}
    for field_name, cfg in selectors.items():
        try:
            selector, attribute, result_type = _parse_config(cfg)
            if is_json:
                value = navigate_json_path(content, selector)
                if result_type == "array" and not isinstance(value, list):
                    value = [value] if value is not None else []
            else:
                value = extract_data(
                    tree, selector, attribute,
                    detect_selector_type(selector), result_type,
                )
            extracted[field_name] = value
        except Exception:
            extracted[field_name] = None
    return extracted
