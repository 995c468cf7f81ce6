"""html2text-convention HTML→Markdown converter (E4) — clean-room.

The reference generates markdown by running its vendored html2text
fork with {body_width: 0, single_line_break: True, mark_code: True}
(/root/reference/crawl4ai/markdown_generation_strategy.py:180-214).
That library (and its fork) is GPL and ~1,170 lines; per the no-copy
rule nothing here is taken from it.  This module re-implements the
OUTPUT CONVENTIONS of html2text (public, documented behavior) over
the repo's stdlib DOM:

- ATX headings (`# `..`###### `) with surrounding blank lines;
- `**strong**` / `_emphasis_`; `` `code` `` spans;
- `[text](url)` links, `[text](url "title")` with titles,
  `![alt](src)` images, images inside links nest:
  `[![alt](src)](href)`;
- unordered lists `  * item` (two-space base indent, `*` mark),
  ordered lists `  1. item`, nested levels indent one extra level;
- blockquotes `> ` per line, nestable;
- `* * *` horizontal rules;
- pre blocks: 4-space indented lines, wrapped in `[code]`/`[/code]`
  when mark_code is on (the reference's default);
- body_width=0: no line wrapping (the reference's default);
- single_line_break=True: one blank line between blocks.

The engine's interleaved-span pipeline keeps its own walker
(htmlparse._Walker — the parity-pinned dialect); this converter is
the html2text-compatible surface for users migrating markdown
consumers.  Goldens in tests/test_html2md.py pin the conventions.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from crawl4ai_spark.extraction.htmlparse import Node, parse_html

__all__ = ["Html2MdOptions", "html_to_markdown"]

_INLINE_TAGS = {"a", "b", "strong", "i", "em", "code", "span", "sub", "sup",
                "u", "s", "del", "mark", "abbr", "small", "big", "img", "br"}
_SKIP_TAGS = {"script", "style", "head", "title", "meta", "link", "noscript",
              "template", "form", "button", "input", "select", "option",
              "iframe", "svg", "canvas"}
_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


@dataclass
class Html2MdOptions:
    body_width: int = 0              # 0 = never wrap (reference default)
    single_line_break: bool = True   # one \n between blocks
    mark_code: bool = True           # [code]...[/code] around pre
    ignore_links: bool = False
    ignore_images: bool = False
    ignore_emphasis: bool = False
    ul_item_mark: str = "*"


def _collapse(text: str) -> str:
    return re.sub(r"\s+", " ", text)


@dataclass
class _Ctx:
    opts: Html2MdOptions
    blocks: list[str] = field(default_factory=list)
    inline: list[str] = field(default_factory=list)

    def flush(self) -> None:
        text = _collapse("".join(self.inline)).strip()
        self.inline = []
        if text:
            self.blocks.append(text)

    def block(self, text: str) -> None:
        self.flush()
        if text:
            self.blocks.append(text)


def _inline_of(node: Node, opts: Html2MdOptions) -> str:
    """Render a subtree as inline markdown."""
    out: list[str] = []
    for c in node.children:
        if c.tag == "#text":
            out.append(c.text)
        elif c.tag in _SKIP_TAGS or c.tag.startswith("#"):
            continue
        elif c.tag in ("b", "strong"):
            inner = _collapse(_inline_of(c, opts)).strip()
            out.append(inner if opts.ignore_emphasis or not inner else f"**{inner}**")
        elif c.tag in ("i", "em"):
            inner = _collapse(_inline_of(c, opts)).strip()
            out.append(inner if opts.ignore_emphasis or not inner else f"_{inner}_")
        elif c.tag == "code":
            inner = c.iter_text()
            out.append(f"`{inner}`" if inner else "")
        elif c.tag == "br":
            out.append("\n")
        elif c.tag == "img":
            out.append(_img_md(c, opts))
        elif c.tag == "a":
            out.append(_link_md(c, opts))
        else:
            out.append(_inline_of(c, opts))
    return "".join(out)


def _img_md(node: Node, opts: Html2MdOptions) -> str:
    if opts.ignore_images:
        return node.attrs.get("alt", "")
    src = node.attrs.get("src", "")
    if not src:
        return ""
    alt = node.attrs.get("alt", "")
    title = node.attrs.get("title")
    if title:
        return f'![{alt}]({src} "{title}")'
    return f"![{alt}]({src})"


def _link_md(node: Node, opts: Html2MdOptions) -> str:
    inner = _collapse(_inline_of(node, opts)).strip()
    href = node.attrs.get("href", "")
    if opts.ignore_links or not href:
        return inner
    title = node.attrs.get("title")
    if title:
        return f'[{inner}]({href} "{title}")'
    return f"[{inner}]({href})"


def _walk(node: Node, ctx: _Ctx, list_stack: list[tuple[str, int]]) -> None:
    for c in node.children:
        tag = c.tag
        if tag == "#text":
            ctx.inline.append(c.text)
        elif tag in _SKIP_TAGS or tag.startswith("#"):
            continue
        elif tag in _HEADINGS:
            txt = _collapse(_inline_of(c, ctx.opts)).strip()
            if txt:
                ctx.block("#" * _HEADINGS[tag] + " " + txt)
        elif tag in _INLINE_TAGS:
            if tag == "img":
                ctx.inline.append(_img_md(c, ctx.opts))
            elif tag == "a":
                ctx.inline.append(_link_md(c, ctx.opts))
            elif tag in ("b", "strong", "i", "em", "code"):
                ctx.inline.append(_inline_of(Node("#wrap", {}, [c]), ctx.opts))
            elif tag == "br":
                ctx.inline.append("\n")
            else:
                _walk(c, ctx, list_stack)
        elif tag == "pre":
            code = c.iter_text().strip("\n")
            body = "\n".join("    " + line for line in code.split("\n"))
            if ctx.opts.mark_code:
                ctx.block("[code]\n" + body + "\n[/code]")
            else:
                ctx.block(body)
        elif tag == "blockquote":
            sub = _Ctx(ctx.opts)
            _walk(c, sub, [])
            sub.flush()
            inner = "\n\n".join(sub.blocks)
            quoted = "\n".join(
                ("> " + line).rstrip() for line in inner.split("\n")
            )
            ctx.block(quoted)
        elif tag in ("ul", "ol"):
            ctx.flush()
            ctx.block(_list_md(c, ctx.opts, depth=len(list_stack)))
        elif tag == "hr":
            ctx.block("* * *")
        elif tag == "table":
            ctx.flush()
            _walk(c, ctx, list_stack)   # degrade: row text as blocks
        elif tag in ("tr",):
            txt = _collapse(_inline_of(c, ctx.opts)).strip()
            if txt:
                ctx.block(txt)
        else:
            # generic block container: paragraph boundary
            ctx.flush()
            _walk(c, ctx, list_stack)
            ctx.flush()


def _list_md(node: Node, opts: Html2MdOptions, depth: int) -> str:
    ordered = node.tag == "ol"
    lines: list[str] = []
    n = 0
    indent = "  " * (depth + 1)
    for li in node.children:
        if li.tag != "li":
            continue
        n += 1
        mark = f"{n}." if ordered else opts.ul_item_mark
        # item's own inline content (sub-lists handled separately)
        own = Node("#item", {}, [c for c in li.children if c.tag not in ("ul", "ol")])
        txt = _collapse(_inline_of(own, opts)).strip()
        lines.append(f"{indent}{mark} {txt}")
        for sub in li.children:
            if sub.tag in ("ul", "ol"):
                lines.append(_list_md(sub, opts, depth + 1))
    return "\n".join(lines)


def html_to_markdown(html: str, options: Html2MdOptions | None = None) -> str:
    """Convert HTML to html2text-convention markdown.  Blocks join
    with a blank line; trailing newline like html2text's output."""
    opts = options or Html2MdOptions()
    root = parse_html(html or "")
    ctx = _Ctx(opts)
    _walk(root, ctx, [])
    ctx.flush()
    if not ctx.blocks:
        return ""
    sep = "\n\n"
    out = sep.join(ctx.blocks)
    if opts.body_width and opts.body_width > 0:
        import textwrap

        wrapped = []
        for b in out.split("\n\n"):
            if b.startswith(("    ", "[code]", ">", "#")) or "\n" in b:
                wrapped.append(b)
            else:
                wrapped.append(textwrap.fill(b, width=opts.body_width))
        out = sep.join(wrapped)
    return out + "\n"
