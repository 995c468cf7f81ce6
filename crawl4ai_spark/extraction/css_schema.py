"""JSON-CSS schema extraction (E11) — `{baseSelector, fields[]}` →
structured records, over the stdlib DOM.

Clean-room re-expression of the reference's most-used structured-
extraction API (behavioral spec:
/root/reference/crawl4ai/extraction_strategy.py:804-1242 —
JsonElementExtractionStrategy.extract/_extract_item/
_extract_single_field/_apply_transform/_compute_field, and the
JsonCssExtractionStrategy getters :1223-1242: text =
get_text(strip=True), html = element serialization, attribute =
element.get, and element.select matching descendants only).  The
sandbox has no bs4/lxml, so selection runs on extraction.htmlparse's
Node tree with a CSS subset engine covering the selector forms the
reference's docs/tests use: tag, .class, #id, [attr], [attr=v],
[attr^=v], [attr$=v], [attr*=v], compounds, descendant/child
combinators, and comma groups.

Field types (reference :909-975): text | attribute | html | regex |
nested | list | nested_list | computed; `transform`:
lowercase/uppercase/strip; `default` fallback; baseFields read from
the base element itself.  `computed` supports only `expression`
(evaluated with the item dict as the namespace, like the reference);
`function` fields are rejected — closures don't serialize into an
Arrow UDF.

Spark surface: `css_extract(df, schema, ...)` compiles the JSON
schema into a typed ArrayType(StructType(...)) column — every leaf is
a string, nested → struct, list/nested_list → array<struct> — and
runs one Arrow-batched pandas UDF per row batch.  The schema is
driver-validated once; per-row work is pure Python on the executor.
"""

from __future__ import annotations

import re
from typing import Any

import pandas as pd

from crawl4ai_spark.extraction.htmlparse import Node, parse_html

__all__ = ["select", "extract_with_schema", "schema_to_spark_type", "css_extract"]


# ── CSS selector subset ──────────────────────────────────────────────

_SEG_RE = re.compile(
    r"(?P<tag>[a-zA-Z][a-zA-Z0-9-]*|\*)?"
    r"(?P<rest>(?:[.#][\w-]+|\[[^\]]+\])*)"
)
_PART_RE = re.compile(r"([.#][\w-]+|\[[^\]]+\])")
_ATTR_RE = re.compile(r"\[\s*([\w-]+)\s*(?:([~^$*|]?=)\s*(\"[^\"]*\"|'[^']*'|[^\]]*?)\s*)?\]")


class _Compound:
    """One compound selector: tag + classes + id + attr tests."""

    __slots__ = ("tag", "classes", "id", "attrs")

    def __init__(self, token: str):
        m = _SEG_RE.fullmatch(token.strip())
        if not m or (not m.group("tag") and not m.group("rest")):
            raise ValueError(f"unsupported CSS selector segment: {token!r}")
        self.tag = (m.group("tag") or "*").lower()
        self.classes: list[str] = []
        self.id: str | None = None
        self.attrs: list[tuple[str, str, str]] = []  # (name, op, value)
        for part in _PART_RE.findall(m.group("rest") or ""):
            if part.startswith("."):
                self.classes.append(part[1:])
            elif part.startswith("#"):
                self.id = part[1:]
            else:
                am = _ATTR_RE.fullmatch(part)
                if not am:
                    raise ValueError(f"unsupported attribute selector: {part!r}")
                name, op, val = am.group(1), am.group(2) or "", am.group(3) or ""
                if val and val[0] in "\"'" and val[-1] == val[0]:
                    val = val[1:-1]
                self.attrs.append((name.lower(), op, val))

    def matches(self, node: Node) -> bool:
        if node.tag.startswith("#"):
            return False
        if self.tag != "*" and node.tag != self.tag:
            return False
        if self.classes:
            have = set((node.attrs.get("class") or "").split())
            if not all(c in have for c in self.classes):
                return False
        if self.id is not None and node.attrs.get("id") != self.id:
            return False
        for name, op, val in self.attrs:
            actual = node.attrs.get(name)
            if actual is None:
                return False
            if op == "":
                continue
            if op == "=" and actual != val:
                return False
            if op == "^=" and not actual.startswith(val):
                return False
            if op == "$=" and not actual.endswith(val):
                return False
            if op == "*=" and val not in actual:
                return False
            if op == "~=" and val not in actual.split():
                return False
            if op == "|=" and not (actual == val or actual.startswith(val + "-")):
                return False
        return True


def _parse_selector(selector: str) -> list[list[tuple[str, _Compound]]]:
    """→ list of chains; a chain is [(combinator, compound), ...] with
    combinator ' ' (descendant) or '>' (child); first entry's
    combinator is always descendant (select() searches the subtree)."""
    chains = []
    for group in selector.split(","):
        tokens = group.replace(">", " > ").split()
        chain: list[tuple[str, _Compound]] = []
        comb = " "
        for tok in tokens:
            if tok == ">":
                comb = ">"
                continue
            chain.append((comb, _Compound(tok)))
            comb = " "
        if not chain:
            raise ValueError(f"empty selector in {selector!r}")
        chains.append(chain)
    return chains


def _descendants(node: Node):
    for c in node.children:
        if not c.tag.startswith("#"):
            yield c
            yield from _descendants(c)


def select(root: Node, selector: str) -> list[Node]:
    """All descendant elements of `root` matching `selector`, in
    document order (bs4 `element.select` semantics: the root itself is
    never a match)."""
    out: list[Node] = []
    seen: set[int] = set()
    for chain in _parse_selector(selector):
        current = [root]
        for comb, compound in chain:
            nxt: list[Node] = []
            nxt_seen: set[int] = set()
            for base in current:
                pool = (
                    (c for c in base.children if not c.tag.startswith("#"))
                    if comb == ">"
                    else _descendants(base)
                )
                for cand in pool:
                    if id(cand) not in nxt_seen and compound.matches(cand):
                        nxt_seen.add(id(cand))
                        nxt.append(cand)
            current = nxt
        for n in current:
            if id(n) not in seen:
                seen.add(id(n))
                out.append(n)
    # document order across comma groups
    order: dict[int, int] = {}

    def _index(node: Node, counter=[0]):
        order[id(node)] = counter[0]
        counter[0] += 1
        for c in node.children:
            _index(c, counter)

    _index(root)
    out.sort(key=lambda n: order[id(n)])
    return out


# ── element getters (JsonCssExtractionStrategy:1235-1242 parity) ─────

def _element_text(node: Node) -> str:
    """bs4 get_text(strip=True): each text node stripped, empty ones
    dropped, concatenated with no separator."""
    parts: list[str] = []

    def walk(n: Node) -> None:
        if n.tag == "#text":
            s = n.text.strip()
            if s:
                parts.append(s)
            return
        for c in n.children:
            walk(c)

    walk(node)
    return "".join(parts)


_VOID = {"area", "base", "br", "col", "embed", "hr", "img", "input",
         "source", "track", "wbr", "meta", "link", "param"}


def _element_html(node: Node) -> str:
    if node.tag == "#text":
        return node.text
    attrs = "".join(f' {k}="{v}"' for k, v in node.attrs.items())
    inner = "".join(_element_html(c) for c in node.children)
    if node.tag in _VOID and not node.children:
        return f"<{node.tag}{attrs}/>"
    return f"<{node.tag}{attrs}>{inner}</{node.tag}>"


# ── schema interpreter (extraction_strategy.py:852-1040 parity) ──────

_TRANSFORMS = {
    "lowercase": lambda v: v.lower(),
    "uppercase": lambda v: v.upper(),
    "strip": lambda v: v.strip(),
}


def _single_field(element: Node, field: dict) -> Any:
    if "selector" in field:
        hits = select(element, field["selector"])
        if not hits:
            return field.get("default")
        selected = hits[0]
    else:
        selected = element
    value = None
    ftype = field["type"]
    if ftype == "text":
        value = _element_text(selected)
    elif ftype == "attribute":
        value = selected.attrs.get(field["attribute"])
    elif ftype == "html":
        value = _element_html(selected)
    elif ftype == "regex":
        m = re.search(field["pattern"], _element_text(selected))
        value = m.group(1) if m else None
    if "transform" in field and value is not None:
        value = _TRANSFORMS.get(field["transform"], lambda v: v)(value)
    return value if value is not None else field.get("default")


def _extract_item(element: Node, fields: list[dict]) -> dict:
    item: dict[str, Any] = {}
    for field in fields:
        ftype = field["type"]
        try:
            if ftype == "computed":
                value = (
                    eval(field["expression"], {"__builtins__": {}}, dict(item))  # noqa: S307
                    if "expression" in field
                    else field.get("default")
                )
            elif ftype == "nested":
                hits = select(element, field["selector"])
                value = _extract_item(hits[0], field["fields"]) if hits else {}
            elif ftype in ("list", "nested_list"):
                hits = select(element, field["selector"])
                sub = field["fields"]
                value = [
                    {f["name"]: _single_field(el, f) for f in sub
                     if _single_field(el, f) is not None}
                    if ftype == "list"
                    else _extract_item(el, sub)
                    for el in hits
                ]
            else:
                value = _single_field(element, field)
        except Exception:
            value = field.get("default")
        if value is not None:
            item[field["name"]] = value
    return item


def extract_with_schema(html: str, schema: dict) -> list[dict]:
    """Pure-Python single-page extraction — the unit the pandas UDF
    batches, shared with tests."""
    if not html:
        return []
    root = parse_html(html)
    results = []
    for element in select(root, schema["baseSelector"]):
        item: dict[str, Any] = {}
        for field in schema.get("baseFields", []):
            value = _single_field(element, field)
            if value is not None:
                item[field["name"]] = value
        item.update(_extract_item(element, schema["fields"]))
        if item:
            results.append(item)
    return results


# ── Spark surface ────────────────────────────────────────────────────

def schema_to_spark_type(schema: dict):
    """Compile a JSON-CSS schema into ArrayType(StructType) — leaves
    are strings (the reference emits JSON; we emit typed columns)."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    def field_type(field: dict):
        ftype = field["type"]
        if ftype == "nested":
            return StructType([StructField(f["name"], field_type(f)) for f in field["fields"]])
        if ftype in ("list", "nested_list"):
            return ArrayType(
                StructType([StructField(f["name"], field_type(f)) for f in field["fields"]])
            )
        return StringType()

    fields = [
        StructField(f["name"], field_type(f))
        for f in schema.get("baseFields", []) + schema["fields"]
    ]
    return ArrayType(StructType(fields))


def css_extract(df, schema: dict, html_col: str = "html", out_col: str = "items"):
    """Adds `out_col`: array<struct> of schema-extracted records per
    page.  One Arrow hop; the driver validates the schema by compiling
    it before shipping (bad selectors fail fast, not per-row)."""
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    for f in schema["fields"]:
        if f["type"] == "computed" and "function" in f:
            raise ValueError("computed.function is not distributable; use expression")
    _parse_selector(schema["baseSelector"])  # fail fast on driver
    spark_type = schema_to_spark_type(schema)

    def _strfy(value: Any, field: dict) -> Any:
        ftype = field["type"]
        if ftype == "nested":
            return {f["name"]: _strfy((value or {}).get(f["name"]), f) for f in field["fields"]}
        if ftype in ("list", "nested_list"):
            return [
                {f["name"]: _strfy(item.get(f["name"]), f) for f in field["fields"]}
                for item in (value or [])
            ]
        return None if value is None else str(value)

    all_fields = schema.get("baseFields", []) + schema["fields"]

    @pandas_udf(spark_type)
    def udf(html: pd.Series) -> pd.Series:
        out = []
        for h in html:
            items = extract_with_schema(h if isinstance(h, str) else "", schema)
            out.append([
                {f["name"]: _strfy(it.get(f["name"]), f) for f in all_fields}
                for it in items
            ])
        return pd.Series(out)

    return df.withColumn(out_col, udf(F.col(html_col)))
