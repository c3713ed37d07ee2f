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

import html.parser as _hp
import re
from html import unescape
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


# ---------------------------------------------------------------------------
# Fast tokenizer (hot path)
#
# html.parser's goahead/parse_starttag cost ~2 µs/tag in per-char bookkeeping
# and attribute-value unescaping we never use (handlers ignore attrs). This
# tokenizer reuses html.parser's OWN compiled grammar regexes for tag
# boundaries, so clean markup produces the exact same event stream; any
# construct it cannot replicate bit-for-bit (truncated tags, incomplete
# comments, CDATA sections, rawtext edge cases) returns None and the whole
# document takes the exact html.parser path instead. Equality is enforced by
# a differential test over the corpus + generated + adversarial inputs.
# ---------------------------------------------------------------------------

_RAWTEXT_CLOSE = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}


def _fast_events(raw: str) -> Optional[List[Tuple[str, str]]]:
    """Tokenize to [('s'|'e'|'d', arg)] events, or None -> use exact parser."""
    ev: List[Tuple[str, str]] = []
    n = len(raw)
    i = 0
    find = raw.find
    locate = _hp.locatestarttagend_tolerant.match
    tagfind = _hp.tagfind_tolerant.match
    endtagfind = _hp.endtagfind.match
    while i < n:
        lt = find("<", i)
        if lt < 0:
            ev.append(("d", unescape(raw[i:])))
            break
        if lt > i:
            ev.append(("d", unescape(raw[i:lt])))
        i = lt
        c = raw[i + 1 : i + 2]
        if c.isalpha() and c.isascii():
            m = locate(raw, i)
            k = m.end()
            if raw.startswith(">", k):
                endpos, selfclosing = k + 1, False
            elif raw.startswith("/>", k):
                endpos, selfclosing = k + 2, True
            else:
                return None  # truncated or pathological start tag
            tag = tagfind(raw, i + 1).group(1).lower()
            ev.append(("s", tag))
            if selfclosing:
                ev.append(("e", tag))
                i = endpos
                continue
            if tag in _RAWTEXT_CLOSE:
                mclose = _RAWTEXT_CLOSE[tag].search(raw, endpos)
                if not mclose:
                    break  # unterminated rawtext: rest of doc is swallowed
                j = mclose.start()
                em = endtagfind(raw, j)
                if not em:
                    return None  # '</script x>'-style close: exact path
                if j > endpos:
                    ev.append(("d", raw[endpos:j]))  # rawtext: NO unescape
                ev.append(("e", tag))
                i = em.end()
            else:
                i = endpos
        elif c == "/":
            em = endtagfind(raw, i)
            if em:
                ev.append(("e", em.group(1).lower()))
                i = em.end()
            elif raw.startswith("</>", i):
                i += 3  # consumed silently
            else:
                nm = tagfind(raw, i + 2)
                if nm:  # tolerant endtag: '</div foo>' -> end 'div'
                    gt = find(">", nm.end())
                    if gt < 0:
                        return None
                    ev.append(("e", nm.group(1).lower()))
                    i = gt + 1
                else:
                    gt = find(">", i + 1)
                    if gt < 0:  # dangling '</' at EOF: '<' then raw rest
                        ev.append(("d", "<"))
                        if i + 1 < n:
                            ev.append(("d", unescape(raw[i + 1 :])))
                        break
                    i = gt + 1  # bogus endtag ('</3>') consumed silently
        elif c == "!":
            if raw.startswith("<!--", i):
                m = _hp.commentclose.search(raw, i + 4)
                if not m:
                    return None  # incomplete comment: exact path
                i = m.end()
            elif raw.startswith("<![", i):
                return None  # marked section (CDATA/conditional): exact path
            else:
                gt = find(">", i + 1)
                if gt < 0:
                    return None
                i = gt + 1  # declaration/bogus consumed silently
        elif c == "?":
            m = _hp.piclose.search(raw, i + 2)
            if not m:
                return None
            i = m.end()
        else:
            ev.append(("d", "<"))  # literal '<' is its own data event
            i += 1
    return ev


def extract_main_content(
    html_bytes: bytes,
    min_block_chars: int = MIN_BLOCK_CHARS,
    max_link_density: float = MAX_LINK_DENSITY,
    engine: str = "auto",
) -> Tuple[str, List[Tuple[str, int, int]]]:
    """Return (main_text, spans). spans = (tag, start, end) per kept block.

    Heuristic: keep content blocks that carry enough text (>= min_block_chars)
    and are not link-dominated (< max_link_density); headings adjacent to kept
    content are retained regardless of length (they label the content).

    engine: 'auto' (fast tokenizer, exact fallback), 'exact' (html.parser),
    'fast' (fail if the fast path bails — test use only).
    """
    try:
        raw = html_bytes.decode("utf-8")
    except UnicodeDecodeError:
        raw = html_bytes.decode("utf-8", errors="replace")
    parser = _MainContentParser()
    events = None if engine == "exact" else _fast_events(raw)
    if events is not None:
        handle = {
            "s": lambda a: parser.handle_starttag(a, ()),
            "e": parser.handle_endtag,
            "d": parser.handle_data,
        }
        try:
            for kind, arg in events:
                handle[kind](arg)
            parser._flush()
        except Exception:
            pass  # keep whatever blocks were collected before the error
    else:
        if engine == "fast":
            raise ValueError("fast tokenizer bailed on this input")
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
