"""Lenient HTML parsing + per-page extraction (pure Python, stdlib).

Clean-room re-expression of the reference's scrape stage (behavioral
spec: /root/reference/crawl4ai/content_scraping_strategy.py:101-896 —
tag removal :694-698, link extraction + internal/external split
:255-307, image scoring/variants :406-511, video/audio :339-355;
metadata: utils.py:1496-1579).  The reference uses lxml; this sandbox
has no lxml, so we build a minimal DOM with html.parser.  The DOM is
only as rich as extraction needs: tags, attrs, text, document order.

The output contract is the engine's, not lxml's: one `PageExtract`
per page carrying links (raw hrefs — canonicalization happens in the
frontier, like link_discovery does, bfs_strategy.py:105), media items
in document order (group_id = document-order index,
content_scraping_strategy.py:474), metadata, markdown blocks and the
north-rule interleaved spans (SURVEY.md §1.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

from crawl4ai_spark.functions.urlnorm import get_base_domain, is_external_url

# Tags always removed before any extraction (reference :694-698 + forms).
REMOVE_TAGS = {"script", "style", "link", "meta", "noscript", "template", "form"}
# Void elements: no closing tag.
VOID_TAGS = {"area", "base", "br", "col", "embed", "hr", "img", "input",
             "source", "track", "wbr", "meta", "link", "param"}
# Elements whose open sibling of the same tag is implicitly closed.
_IMPLIED_CLOSE = {"p", "li", "option", "tr", "td", "th", "dd", "dt"}

HEADING_TAGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
BLOCK_TAGS = {"p", "div", "section", "article", "main", "header", "footer",
              "aside", "nav", "ul", "ol", "li", "table", "blockquote", "pre",
              "figure", "figcaption", "br", "hr"} | set(HEADING_TAGS)


@dataclass
class Node:
    tag: str                      # '#text' for text nodes
    attrs: dict[str, str] = field(default_factory=dict)
    children: list["Node"] = field(default_factory=list)
    text: str = ""                # only for '#text'

    def iter_text(self) -> str:
        if self.tag == "#text":
            return self.text
        return "".join(c.iter_text() for c in self.children)

    def find_all(self, tag: str):
        if self.tag == tag:
            yield self
        for c in self.children:
            yield from c.find_all(tag)


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack: list[Node] = [self.root]
        self._skip_depth = 0  # inside a REMOVE_TAGS subtree

    def handle_starttag(self, tag, attrs):
        if self._skip_depth:
            if tag not in VOID_TAGS:
                self._skip_depth += 1
            return
        if tag in REMOVE_TAGS:
            # meta/link are void: nothing to skip; keep them out of the tree
            # but still surface head metadata via a side channel below.
            if tag in VOID_TAGS:
                self._handle_void_removed(tag, dict(attrs))
            else:
                self._skip_depth = 1
            return
        if tag in _IMPLIED_CLOSE and self.stack[-1].tag == tag:
            self.stack.pop()
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def _handle_void_removed(self, tag: str, attrs: dict[str, str]) -> None:
        # Keep <meta> reachable for metadata extraction even though it's
        # stripped from the content tree (reference extracts metadata
        # BEFORE cleaning, utils.py:1496).
        node = Node(tag, attrs)
        self.root.children.append(Node("#removed-" + tag, attrs, [node]))

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in VOID_TAGS and not self._skip_depth and self.stack[-1].tag == tag:
            self.stack.pop()

    def handle_endtag(self, tag):
        if self._skip_depth:
            if tag not in VOID_TAGS:
                self._skip_depth -= 1
            return
        if tag in VOID_TAGS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched close tag: ignore

    def handle_data(self, data):
        if self._skip_depth or not data:
            return
        self.stack[-1].children.append(Node("#text", text=data))


def parse_html(html: str) -> Node:
    builder = _TreeBuilder()
    try:
        builder.feed(html or "")
        builder.close()
    except Exception:
        pass  # lenient: keep whatever was parsed
    return builder.root


# ── metadata (E3; utils.py:1496-1579) ─────────────────────────────────

def extract_metadata(root: Node) -> dict[str, str]:
    meta: dict[str, str] = {}
    for t in root.find_all("title"):
        title = _collapse_ws(t.iter_text())
        if title:
            meta["title"] = title
        break
    for holder in root.children:
        if holder.tag != "#removed-meta":
            continue
        attrs = holder.attrs
        name = (attrs.get("name") or attrs.get("property") or "").lower()
        content = attrs.get("content", "")
        if not name or not content:
            continue
        if name in ("description", "keywords", "author"):
            meta.setdefault(name, content)
        elif name.startswith(("og:", "twitter:", "article:")):
            meta.setdefault(name, content)
    # og:title fallback for missing <title> (utils.py:1510-1520)
    if "title" not in meta and "og:title" in meta:
        meta["title"] = meta["og:title"]
    return meta


def _collapse_ws(s: str) -> str:
    return " ".join(s.split())


# ── links (E1 link part; content_scraping_strategy.py:255-307) ─────────

@dataclass
class LinkItem:
    href: str
    text: str
    title: str
    internal: bool


def extract_links(root: Node, page_url: str) -> list[LinkItem]:
    base_domain = get_base_domain(page_url)
    out: list[LinkItem] = []
    seen: set[str] = set()
    for a in root.find_all("a"):
        href = (a.attrs.get("href") or "").strip()
        if not href:
            continue
        if href in seen:  # de-dup by raw href, first occurrence wins (:299-303)
            continue
        seen.add(href)
        out.append(
            LinkItem(
                href=href,
                text=_collapse_ws(a.iter_text()),
                title=a.attrs.get("title", ""),
                internal=not is_external_url(href, base_domain),
            )
        )
    return out


# ── media (E2; content_scraping_strategy.py:309-355, 406-511) ──────────

@dataclass
class MediaItem:
    src: str
    alt: str
    media_type: str  # image | video | audio
    score: int
    group_id: int


def _image_src(attrs: dict[str, str]) -> str:
    src = attrs.get("src") or attrs.get("data-src") or ""
    if not src and attrs.get("srcset"):
        first = attrs["srcset"].split(",")[0].strip().split(" ")[0]
        src = first
    return src.strip()


def _image_score(attrs: dict[str, str]) -> int:
    """Deterministic subset of the reference's image heuristic
    (process_image :406-511): size>150 +1, alt +1, non-data URI +1,
    srcset/picture variants +1, format hint +1."""
    score = 0
    for dim in ("width", "height"):
        v = attrs.get(dim, "")
        digits = "".join(ch for ch in v if ch.isdigit())
        if digits and int(digits) > 150:
            score += 1
            break
    if attrs.get("alt"):
        score += 1
    src = _image_src(attrs)
    if src and not src.startswith("data:"):
        score += 1
    if attrs.get("srcset"):
        score += 1
    if any(src.lower().endswith(e) for e in (".jpg", ".jpeg", ".png", ".webp", ".avif")):
        score += 1
    return score


def _media_src_of(node: Node) -> str:
    src = (node.attrs.get("src") or "").strip()
    if src:
        return src
    for s in node.find_all("source"):
        ssrc = (s.attrs.get("src") or "").strip()
        if ssrc:
            return ssrc
    return ""


# ── the combined walk: blocks + media in document order ────────────────

@dataclass
class Block:
    kind: str        # 'text' | 'media'
    text: str = ""   # markdown text for 'text'
    media_ref: str = ""
    media_type: str = ""
    media_alt: str = ""
    media_score: int = 0


class _Walker:
    """Single document-order walk producing markdown blocks interleaved
    with media items — the span sequence IS this walk's output."""

    def __init__(self) -> None:
        self.blocks: list[Block] = []
        self._buf: list[str] = []     # inline text of the open block
        self._media: list[MediaItem] = []

    # -- inline flushing ------------------------------------------------
    def flush(self) -> None:
        text = _collapse_ws("".join(self._buf))
        self._buf = []
        if text:
            self.blocks.append(Block("text", text=text))

    def emit_text_block(self, text: str) -> None:
        self.flush()
        if text:
            self.blocks.append(Block("text", text=text))

    def emit_media(self, src: str, media_type: str, alt: str, score: int) -> None:
        if not src:
            return
        self.flush()
        self._media.append(MediaItem(src, alt, media_type, score, len(self._media)))
        self.blocks.append(
            Block("media", media_ref=src, media_type=media_type, media_alt=alt, media_score=score)
        )

    # -- recursive walk -------------------------------------------------
    def walk(self, node: Node, list_depth: int = 0, ordered: bool = False) -> None:
        for child in node.children:
            tag = child.tag
            if tag == "#text":
                self._buf.append(child.text)
            elif tag.startswith("#removed-"):
                continue
            elif tag in HEADING_TAGS:
                self.flush()
                txt = _collapse_ws(self._inline(child))
                if txt:
                    self.blocks.append(Block("text", text="#" * HEADING_TAGS[tag] + " " + txt))
            elif tag == "img":
                self.emit_media(_image_src(child.attrs), "image",
                                child.attrs.get("alt", ""), _image_score(child.attrs))
            elif tag in ("video", "audio"):
                self.emit_media(_media_src_of(child), tag, child.attrs.get("title", ""), 0)
            elif tag == "pre":
                self.flush()
                code = child.iter_text().strip("\n")
                if code.strip():
                    self.blocks.append(Block("text", text="```\n" + code + "\n```"))
            elif tag == "blockquote":
                self.flush()
                inner = _Walker()
                inner.walk(child)
                for b in inner.blocks:
                    if b.kind == "text":
                        quoted = "\n".join("> " + line for line in b.text.split("\n"))
                        self.blocks.append(Block("text", text=quoted))
                    else:
                        self._adopt_media(inner, b)
            elif tag in ("ul", "ol"):
                self.flush()
                self._walk_list(child, list_depth, ordered=(tag == "ol"))
            elif tag == "table":
                self.flush()
                md = self._table_markdown(child)
                if md:
                    self.blocks.append(Block("text", text=md))
            elif tag == "br":
                self._buf.append(" ")
            elif tag == "hr":
                self.emit_text_block("---")
            elif tag in BLOCK_TAGS:
                self.flush()
                self.walk(child, list_depth, ordered)
                self.flush()
            else:
                # inline element: render into the open buffer
                self._buf.append(self._inline(child))
        # top-level call leaves a trailing buffer
        if node.tag in ("#root", "body", "html"):
            self.flush()

    def _adopt_media(self, inner: "_Walker", b: Block) -> None:
        self._media.append(
            MediaItem(b.media_ref, b.media_alt, b.media_type, b.media_score, len(self._media))
        )
        self.blocks.append(b)

    def _walk_list(self, node: Node, depth: int, ordered: bool) -> None:
        idx = 0
        for child in node.children:
            if child.tag != "li":
                continue
            idx += 1
            # a list item may itself contain nested lists
            sub = _Walker()
            sub.walk(child, depth + 1, ordered)
            sub.flush()
            texts: list[str] = []
            for b in sub.blocks:
                if b.kind == "media":
                    self._adopt_media(sub, b)
                    continue
                if b.text:
                    texts.append(b.text)
            if texts:
                prefix = ("  " * depth) + (f"{idx}. " if ordered else "- ")
                self.blocks.append(Block("text", text=prefix + texts[0]))
                # nested-list / multi-paragraph items stay separate blocks
                # (they already carry their own indentation prefixes)
                for t in texts[1:]:
                    self.blocks.append(Block("text", text=t))

    def _inline(self, node: Node) -> str:
        tag = node.tag
        inner = "".join(
            c.text if c.tag == "#text" else self._inline(c) for c in node.children
        )
        if tag in ("strong", "b"):
            return f"**{inner.strip()}**" if inner.strip() else ""
        if tag in ("em", "i"):
            return f"*{inner.strip()}*" if inner.strip() else ""
        if tag == "code":
            return f"`{inner.strip()}`" if inner.strip() else ""
        if tag == "a":
            href = (node.attrs.get("href") or "").strip()
            text = _collapse_ws(inner)
            if href:
                title = node.attrs.get("title", "")
                tpart = f' "{title}"' if title else ""
                return f"[{text}]({href}{tpart})"
            return text
        if tag == "img":
            # inline image handled by walk() when block-level; as a pure
            # inline fallback render markdown image syntax
            src = _image_src(node.attrs)
            return f"![{node.attrs.get('alt', '')}]({src})" if src else ""
        if tag == "br":
            return " "
        return inner

    def _table_markdown(self, table: Node) -> str:
        rows: list[list[str]] = []
        header: list[str] | None = None
        for tr in table.find_all("tr"):
            cells = [
                _collapse_ws(self._inline(td))
                for td in tr.children
                if td.tag in ("td", "th")
            ]
            if not cells:
                continue
            if header is None and any(td.tag == "th" for td in tr.children):
                header = cells
            else:
                rows.append(cells)
        if header is None and rows:
            header = rows.pop(0)
        if not header:
            return ""
        lines = ["| " + " | ".join(header) + " |",
                 "| " + " | ".join("---" for _ in header) + " |"]
        for r in rows:
            r = (r + [""] * len(header))[: len(header)]
            lines.append("| " + " | ".join(r) + " |")
        return "\n".join(lines)


# ── the page-level API ────────────────────────────────────────────────

@dataclass
class PageExtract:
    url: str
    metadata: dict[str, str]
    links: list[LinkItem]
    media: list[MediaItem]
    blocks: list[Block]          # interleaved text+media, document order

    @property
    def spans(self) -> list[tuple[str, str, str, int]]:
        """North-rule span tuples: (kind, text, media_ref, offset)."""
        return [
            (b.kind, b.text if b.kind == "text" else "",
             b.media_ref if b.kind == "media" else "", i)
            for i, b in enumerate(self.blocks)
        ]

    @property
    def raw_markdown(self) -> str:
        parts = []
        for b in self.blocks:
            if b.kind == "text":
                parts.append(b.text)
            else:
                parts.append(f"![{b.media_alt}]({b.media_ref})")
        return "\n\n".join(parts)


def extract_page(url: str, html: str, excluded_tags: set[str] | None = None) -> PageExtract:
    """Full scrape of one page: parse → metadata → clean → links/media/
    blocks in a single document-order walk."""
    root = parse_html(html)
    metadata = extract_metadata(root)
    if excluded_tags:
        _prune(root, excluded_tags)
    links = extract_links(root, url)
    walker = _Walker()
    body = next(root.find_all("body"), root)
    walker.walk(body)
    return PageExtract(url=url, metadata=metadata, links=links,
                       media=walker._media, blocks=walker.blocks)


def _prune(node: Node, excluded: set[str]) -> None:
    node.children = [c for c in node.children if c.tag not in excluded]
    for c in node.children:
        _prune(c, excluded)
