"""HTML main-content extraction: DOM -> ordered text blocks.

The reference extracts PDF page text as an ordered sequence of layout
blocks (app/services/ocr_service.py:137-145: per page, ``get_text("blocks")``,
block texts joined by '\\n', in-block newlines flattened to spaces).  For
HTML text spans our analog is a DOM walk producing reading-order blocks,
scored readability/trafilatura-style:

* container tags ``nav header footer aside script style form noscript``
  are boilerplate — every block inside them is dropped;
* a block's **link density** = chars inside <a> / total chars; blocks whose
  link density > 0.5 are link farms and dropped (they never even reach the
  line cleaner, mirroring how the reference never OCRs annotations);
* surviving blocks keep their text with intra-block whitespace collapsed to
  single spaces (the '\\n' -> ' ' flatten of ocr_service.py:143).

The output is the raw block sequence; line-level rejection rules
(ocr_ray.kernels.cleaner) run afterwards, exactly like Cleaner runs after
the block walk in the reference (ocr_service.py:144).

Implementation is a single streaming pass with the stdlib HTMLParser —
no recursion, so 100+-level nested DOMs (the ``deep_dom`` archetype) are
handled in O(depth) memory.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# tags that open a new text block (reading-order boundaries)
BLOCK_TAGS = frozenset(
    "p div li h1 h2 h3 h4 h5 h6 td th tr table ul ol dl dt dd blockquote "
    "pre article section main figure figcaption title br hr".split()
)
# subtree = boilerplate
DROP_TAGS = frozenset("nav header footer aside script style form noscript".split())
# elements with no closing tag
VOID_TAGS = frozenset("br hr img meta link input area base col embed source track wbr".split())

_WS = re.compile(r"\s+")


class _BlockCollector(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []  # (text, link_chars)
        self._parts: list[str] = []
        self._link_chars = 0
        self._drop_depth = 0
        self._anchor_depth = 0

    # -- block lifecycle -----------------------------------------------
    def _flush(self):
        if not self._parts:
            return
        text = _WS.sub(" ", "".join(self._parts)).strip()
        if text:
            self.blocks.append((text, self._link_chars))
        self._parts = []
        self._link_chars = 0

    # -- parser callbacks ----------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in DROP_TAGS:
            self._flush()
            if tag not in VOID_TAGS:
                self._drop_depth += 1
            return
        if tag in BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._anchor_depth += 1

    def handle_endtag(self, tag):
        if tag in DROP_TAGS:
            if self._drop_depth > 0:
                self._drop_depth -= 1
            return
        if tag in BLOCK_TAGS:
            self._flush()
        if tag == "a" and self._anchor_depth > 0:
            self._anchor_depth -= 1

    def handle_data(self, data):
        if self._drop_depth > 0 or not data:
            return
        self._parts.append(data)
        if self._anchor_depth > 0:
            self._link_chars += len(data.strip())

    def close(self):
        super().close()
        self._flush()


def html_to_blocks(html: str, *, max_link_density: float = 0.5) -> list[str]:
    """Parse HTML into reading-order main-content blocks.

    Pure function; tolerant of malformed HTML (parser never raises).
    Plain text (no tags) comes back as its own block sequence split on
    blank runs — so the same code path serves non-HTML text spans.
    """
    parser = _BlockCollector()
    try:
        parser.feed(html)
        parser.close()
    except Exception:  # stdlib parser is robust; belt and braces
        pass
    kept = []
    for text, link_chars in parser.blocks:
        if len(text) > 0 and link_chars / len(text) > max_link_density:
            continue
        kept.append(text)
    return kept


def extract_main_text(html: str, *, max_link_density: float = 0.5) -> str:
    """Blocks joined by newline — the input contract of the line cleaner
    (the reference joins block texts with '\\n', ocr_service.py:143)."""
    return "\n".join(html_to_blocks(html, max_link_density=max_link_density))
