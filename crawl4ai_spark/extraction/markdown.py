"""Markdown post-processing: link→citation conversion (E4).

Clean-room re-expression of
DefaultMarkdownGenerator.convert_links_to_citations
(/root/reference/crawl4ai/markdown_generation_strategy.py:82-146):
every markdown link `[text](url "title")` becomes `text⟨n⟩` (images:
`![text⟨n⟩]`), numbered by first occurrence of the resolved URL, with
a references section `⟨n⟩ url: title - text`.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

# Reference-parity link pattern (markdown_generation_strategy.py:11):
# text is NON-empty ([^\]]+ — `[](u)` is left untouched), url is
# non-greedy [^)]+? so it may contain spaces/quotes, title optional.
_LINK_RE = re.compile(r"!?\[([^\]]+)\]\(([^)]+?)(?:\s+\"([^\"]*)\")?\)")


def resolve_citation_url(base: str, url: str) -> str:
    """Reference-parity URL join for citations
    (markdown_generation_strategy.py:14-24 `fast_urljoin`): scheme'd /
    protocol-relative / mailto URLs pass through; a leading-slash path
    is STRING-CONCATENATED onto the full base (the reference's
    documented fast path — not RFC 3986 resolution, kept verbatim for
    byte-parity); everything else falls back to urljoin."""
    if url.startswith(("http://", "https://", "mailto:", "//")):
        return url
    if url.startswith("/"):
        if base.endswith("/"):
            return base[:-1] + url
        return base + url
    return urljoin(base, url)


def convert_links_to_citations(markdown: str, base_url: str = "") -> tuple[str, str]:
    """Returns (markdown_with_citations, references_markdown)."""
    link_map: dict[str, tuple[int, str]] = {}
    url_cache: dict[str, str] = {}
    parts: list[str] = []
    last_end = 0
    counter = 1

    for m in _LINK_RE.finditer(markdown):
        parts.append(markdown[last_end : m.start()])
        text, url, title = m.group(1), m.group(2), m.group(3)

        if base_url and not url.startswith(("http://", "https://", "mailto:")):
            if url not in url_cache:
                url_cache[url] = resolve_citation_url(base_url, url)
            url = url_cache[url]

        if url not in link_map:
            desc = []
            if title:
                desc.append(title)
            if text and text != title:
                desc.append(text)
            link_map[url] = (counter, ": " + " - ".join(desc) if desc else "")
            counter += 1

        num = link_map[url][0]
        if m.group(0).startswith("!"):
            parts.append(f"![{text}⟨{num}⟩]")
        else:
            parts.append(f"{text}⟨{num}⟩")
        last_end = m.end()

    parts.append(markdown[last_end:])
    converted = "".join(parts)

    references = ["\n\n## References\n\n"]
    references.extend(
        f"⟨{num}⟩ {url}{desc}\n"
        for url, (num, desc) in sorted(link_map.items(), key=lambda kv: kv[1][0])
    )
    return converted, "".join(references)
