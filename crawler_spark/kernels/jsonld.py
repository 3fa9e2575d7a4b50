"""JSON-LD structured-data extraction from <script type="application/ld+json">.

The dominant machine-readable metadata surface on modern portals (court
decisions and gazette pages publish schema.org LegalDocument/Article nodes),
and the one extraction surface the selector engine deliberately excludes
(kernels/htmlparse.py SKIP_TAGS drops script content from text extraction).
The reference parses page metadata selector-wise
(`/root/reference/crawler/services/selector_processor.py`); structured-data
blocks are the Spark-native extension of that extraction map.

From-scratch, stdlib only: the shared tolerant DOM (kernels/dom.py — stdlib
``html.parser`` keeps script bodies as CDATA text children) locates the
blocks; ``json.loads`` parses them; a deterministic flatten turns each
top-level node into typed (block_idx, item_idx, item_type, field, idx,
value) rows that survive the driver's sort-based canonicalizer.

Flatten contract (fixed — the SQL oracles replay it):
- A block whose top level is a LIST yields one item per element; a dict
  with an ``@graph`` list yields one item per graph element; any other
  dict is a single item. Non-dict items are skipped.
- ``item_type`` is the item's ``@type`` (lists joined with ``|``).
- Scalars at path p -> one row (field=p, idx=0); lists of scalars -> one
  row per element (field=p, idx=i); nested dicts -> dotted paths (p.child);
  dicts/lists inside lists -> indexed paths (p[i].child).
- Values are canonicalized: strings as-is, ints/floats via str(), booleans
  as ``true``/``false``, null as SQL NULL.

Hostile-input bounds (crawled pages are untrusted): blocks over
MAX_BLOCK_BYTES and blocks that fail ``json.loads`` are SKIPPED (they still
consume a block index — extraction must not shift because an ad injected a
broken block); recursion depth and per-page row count are capped.
"""

from __future__ import annotations

import json

from crawler_spark.kernels.dom import Node, build_tree, iter_elements

MAX_BLOCK_BYTES = 1 << 20   # 1 MiB per ld+json block
MAX_DEPTH = 6               # nested-path recursion cap
MAX_ROWS_PER_PAGE = 10_000  # flatten fan-out cap (truncates, never throws)


def find_jsonld_blocks(root: Node) -> list[str]:
    """Raw text of every <script type="application/ld+json"> block, in
    document order (whitespace-insensitive type match, per HTML spec)."""
    out = []
    for el in iter_elements(root):
        if el.tag == "script" and (
            el.attrs.get("type", "").strip().lower() == "application/ld+json"
        ):
            out.append("".join(c for c in el.children if isinstance(c, str)))
    return out


def _canon(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return v
    return str(v)


def _item_type(item: dict) -> str | None:
    t = item.get("@type")
    if t is None:
        return None
    if isinstance(t, list):
        return "|".join(str(x) for x in t)
    return str(t)


def _flatten_value(path: str, v, depth: int, rows: list, meta: tuple) -> None:
    if len(rows) >= MAX_ROWS_PER_PAGE:
        return
    if isinstance(v, dict):
        if depth >= MAX_DEPTH:
            return
        for k, child in v.items():
            _flatten_value(f"{path}.{k}", child, depth + 1, rows, meta)
    elif isinstance(v, list):
        if depth >= MAX_DEPTH:
            return
        for i, el in enumerate(v):
            if len(rows) >= MAX_ROWS_PER_PAGE:
                return
            if isinstance(el, (dict, list)):
                _flatten_value(f"{path}[{i}]", el, depth + 1, rows, meta)
            else:
                rows.append((*meta, path, i, _canon(el)))
    else:
        rows.append((*meta, path, 0, _canon(v)))


def flatten_jsonld(html: str | bytes | None) -> list[tuple]:
    """Parse + flatten every JSON-LD block of a page into
    (block_idx, item_idx, item_type, field, idx, value) tuples."""
    rows: list[tuple] = []
    for block_idx, raw in enumerate(find_jsonld_blocks(build_tree(html))):
        if len(raw.encode("utf-8", "replace")) > MAX_BLOCK_BYTES:
            continue
        try:
            data = json.loads(raw)
        except ValueError:
            continue
        if isinstance(data, list):
            items = data
        elif isinstance(data, dict) and isinstance(data.get("@graph"), list):
            items = data["@graph"]
        elif isinstance(data, dict):
            items = [data]
        else:
            continue
        for item_idx, item in enumerate(items):
            if not isinstance(item, dict):
                continue
            meta = (block_idx, item_idx, _item_type(item))
            for k, v in item.items():
                if k == "@type":
                    continue
                _flatten_value(k, v, 1, rows, meta)
                if len(rows) >= MAX_ROWS_PER_PAGE:
                    return rows
    return rows
