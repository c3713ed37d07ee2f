"""HTML main-content (boilerplate) stripper — pure Python, Spark-free.

North-rule addition (not present in the reference app): extract the main
content of a web page using DOM-tree heuristics in the spirit of the public
Readability / Boilerpipe / trafilatura literature — text density and link
density per block, tag-path pruning of chrome (nav/header/footer/aside/form),
script/style/comment removal. Deterministic: same bytes in, same text out.

Output is the main text (blocks joined with "\\n") plus character-span
offsets of each kept block within that text, emitted as (tag, start, end).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional, Tuple

__all__ = ["extract_main_content", "html_to_text"]

# elements whose entire subtree is chrome/noise
_PRUNE_TAGS = frozenset(
    "script style noscript nav header footer aside form template svg iframe button select option".split()
)
# elements that delimit text blocks
_BLOCK_TAGS = frozenset(
    "p div article section li h1 h2 h3 h4 h5 h6 td th blockquote pre main figcaption dd dt".split()
)
_VOID_TAGS = frozenset("br hr img input meta link area base col embed source track wbr".split())

MIN_BLOCK_CHARS = 25     # blocks shorter than this are boilerplate noise
MAX_LINK_DENSITY = 0.5   # blocks mostly made of anchor text are navigation


class _Block:
    __slots__ = ("tag", "text_parts", "link_chars", "heading")

    def __init__(self, tag: str, heading: bool) -> None:
        self.tag = tag
        self.text_parts: List[str] = []
        self.link_chars = 0
        self.heading = heading

    def text(self) -> str:
        return _normalize_ws("".join(self.text_parts))

    def link_density(self) -> float:
        t = self.text()
        return (self.link_chars / len(t)) if t else 1.0


def _normalize_ws(s: str) -> str:
    return " ".join(s.split())


class _MainContentParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[_Block] = []
        self._stack: List[str] = []
        self._prune_depth = 0
        self._anchor_depth = 0
        self._cur: Optional[_Block] = None

    # -- element boundaries -------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        if tag in _VOID_TAGS:
            if tag == "br" and self._cur is not None:
                self._cur.text_parts.append(" ")
            return
        self._stack.append(tag)
        if tag in _PRUNE_TAGS:
            self._prune_depth += 1
        if tag == "a":
            self._anchor_depth += 1
        if tag in _BLOCK_TAGS and self._prune_depth == 0:
            self._flush()
            self._cur = _Block(tag, heading=tag in ("h1", "h2", "h3", "h4", "h5", "h6"))

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in _VOID_TAGS:
            return
        # unwind to the matching open tag (tolerates misnesting)
        if tag in self._stack:
            while self._stack:
                top = self._stack.pop()
                if top in _PRUNE_TAGS:
                    self._prune_depth = max(0, self._prune_depth - 1)
                if top == "a":
                    self._anchor_depth = max(0, self._anchor_depth - 1)
                if top == tag:
                    break
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._prune_depth or not data:
            return
        if self._cur is None:
            if not data.strip():
                return
            self._cur = _Block("div", heading=False)
        self._cur.text_parts.append(data)
        if self._anchor_depth:
            self._cur.link_chars += len(_normalize_ws(data))

    def _flush(self) -> None:
        if self._cur is not None:
            if self._cur.text():
                self.blocks.append(self._cur)
            self._cur = None

    def close(self) -> None:  # type: ignore[override]
        super().close()
        self._flush()


def extract_main_content(
    html_bytes: bytes,
    min_block_chars: int = MIN_BLOCK_CHARS,
    max_link_density: float = MAX_LINK_DENSITY,
) -> Tuple[str, List[Tuple[str, int, int]]]:
    """Return (main_text, spans). spans = (tag, start, end) per kept block.

    Heuristic: keep content blocks that carry enough text (>= min_block_chars)
    and are not link-dominated (< max_link_density); headings adjacent to kept
    content are retained regardless of length (they label the content).
    """
    try:
        raw = html_bytes.decode("utf-8")
    except UnicodeDecodeError:
        raw = html_bytes.decode("utf-8", errors="replace")
    parser = _MainContentParser()
    try:
        parser.feed(raw)
        parser.close()
    except Exception:
        pass  # keep whatever blocks were collected before the error

    blocks = parser.blocks
    kept: List[Tuple[str, str]] = []  # (tag, text)
    content_idx = [
        i
        for i, b in enumerate(blocks)
        if len(b.text()) >= min_block_chars and b.link_density() < max_link_density
    ]
    content_set = set(content_idx)
    for i, b in enumerate(blocks):
        if i in content_set:
            kept.append((b.tag, b.text()))
        elif (
            b.heading
            and b.link_density() < max_link_density
            and (i + 1 in content_set or i - 1 in content_set)
        ):
            kept.append((b.tag, b.text()))

    spans: List[Tuple[str, int, int]] = []
    parts: List[str] = []
    offset = 0
    for tag, text in kept:
        spans.append((tag, offset, offset + len(text)))
        parts.append(text)
        offset += len(text) + 1  # the joining "\n"
    return "\n".join(parts), spans


def html_to_text(html_bytes: bytes) -> str:
    return extract_main_content(html_bytes)[0]
