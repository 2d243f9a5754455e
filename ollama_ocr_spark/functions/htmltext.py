"""HTML main-content extraction: block tree + text/link-density scoring.

This is the Spark-native analog of the reference's "printed OCR" path
(`/root/reference/ocr_router.py:76-86`): instead of Tesseract over a
binarized image, we strip boilerplate from raw HTML bytes with a
Boilerpipe/trafilatura-style block classifier built on stdlib
``html.parser`` (the sandbox has no lxml/selectolax; the algorithm is the
published text-density + link-density heuristic, not a port of any library).

Semantics (deterministic, pure):

1. decode bytes as UTF-8 (``errors='replace'`` — never raises),
2. build a flat list of text *blocks*: every block-level element opens a new
   block; inline elements accumulate text into the current block,
3. drop entire subtrees of known-boilerplate containers
   (nav/header/footer/aside/form/script/style/head/title/...),
4. for each surviving block, collapse whitespace runs to single spaces
   (standard HTML whitespace semantics) and compute link density
   (chars inside <a> / total chars),
5. keep blocks with non-empty text and link density <= LINK_DENSITY_MAX,
6. join kept blocks with "\n\n" and apply Python ``str.strip()`` —
   mirroring the reference's final ``.strip()`` (`ocr_router.py:301`).

The parser also reports *structure markers* (presence of article/main/table,
block-element count) used by the router's printed-vs-fallback heuristic —
the analog of the reference's HoughLinesP straight-line count
(`ocr_router.py:160-170`: >15 lines → printed).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html import unescape as _unescape
from html.parser import HTMLParser

# Elements that start a new text block.
BLOCK_TAGS = frozenset(
    {
        "p", "div", "article", "section", "main", "li", "ul", "ol",
        "h1", "h2", "h3", "h4", "h5", "h6", "td", "th", "tr", "table",
        "pre", "blockquote", "figcaption", "dd", "dt", "br", "hr",
    }
)

# Entire subtree is boilerplate / non-content.
DROP_TAGS = frozenset(
    {
        "script", "style", "noscript", "template", "nav", "header",
        "footer", "aside", "form", "head", "title", "svg", "iframe",
        "button", "select", "option",
    }
)

# Presence of any of these marks "structured" layout → printed class
# (analog of the reference's many-straight-lines heuristic).
STRUCTURE_TAGS = frozenset({"article", "main", "table"})

# Markdown-ish block serialization: the extractor renders structural
# elements the way the reference's structured modes render documents
# (README.md "markdown output" contract) — list items get a "- " prefix,
# headings get "#"-runs, and a whole <table> becomes ONE block of
# "| cell | cell |" lines. Prefixes attach at block flush; tables collect
# rows and bypass whitespace collapse (their newlines are content).
_PREFIX_TAGS = {
    "li": "- ",
    "h1": "# ", "h2": "## ", "h3": "### ",
    "h4": "#### ", "h5": "##### ", "h6": "###### ",
}
_TABLE_BLOCK = object()  # sentinel marking a pre-rendered table block

# Block-count threshold for the structure heuristic, mirroring the
# reference's `len(lines) > 15 → printed` (`ocr_router.py:166`).
STRUCTURE_BLOCK_THRESHOLD = 15

LINK_DENSITY_MAX = 0.33


@dataclass
class HtmlExtraction:
    text: str
    has_structure: bool
    n_blocks: int
    # Format-preserving render of the SAME kept blocks (reference T7,
    # `ollama_cloud_ocr.py:310-379` "maintain original formatting"):
    # intra-block whitespace/newlines kept verbatim instead of collapsed —
    # the extraction used for the handwriting-routed class. Computed in
    # the same pass (block keep/drop decisions are shared; only the
    # rendering differs).
    text_pre: str = ""
    # metadata captured in the SAME parse pass (the reference's
    # "encode once, run N analysis steps" optimization —
    # `ollama_cloud_ocr.py:541-599`): never re-parse per mode.
    title: str = ""
    h1: str = ""
    n_links: int = 0
    ldjson: tuple[str, ...] = ()
    # populated only when parse_html_blocks(collect_blocks=True): every
    # block's collapsed text BEFORE the keep/drop classification — the
    # input to cross-document template mining.
    all_blocks: tuple[str, ...] = ()


class _BlockParser(HTMLParser):
    """Single-pass block builder. Not thread-safe; one instance per document."""

    def __init__(self, drop_tags: frozenset[str] = DROP_TAGS) -> None:
        super().__init__(convert_charrefs=True)
        self.drop_tags = drop_tags
        # (raw_text, chars, link_chars, prefix) — prefix is "" / a markdown
        # prefix / the _TABLE_BLOCK sentinel (raw already rendered).
        self.blocks: list[tuple[str, int, int, object]] = []
        self._parts: list[str] = []
        self._chars = 0
        self._link_chars = 0
        self._drop_depth = 0
        self._link_depth = 0
        self._prefix = ""
        # table mode
        self._table_depth = 0
        self._table_rows: list[list[str]] = []
        self._cell_parts: list[str] | None = None
        self._table_chars = 0
        self._table_link_chars = 0
        self.structure_hits = 0
        self.block_count = 0
        # metadata side-channels (captured even inside dropped subtrees)
        self.title_parts: list[str] = []
        self.h1_parts: list[str] = []
        self.ldjson: list[str] = []
        self.n_links = 0
        self._in_title = False
        self._in_h1 = False
        self._in_ldjson = False

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        if self._parts:
            raw = "".join(self._parts)
            self.blocks.append((raw, self._chars, self._link_chars, self._prefix))
        self._parts = []
        self._chars = 0
        self._link_chars = 0
        self._prefix = ""

    # -- table mode ------------------------------------------------------
    def _close_cell(self) -> None:
        if self._cell_parts is not None:
            text = " ".join("".join(self._cell_parts).split())
            self._table_rows[-1].append(text)
            self._cell_parts = None

    def _open_cell(self) -> None:
        self._close_cell()
        if not self._table_rows:
            self._table_rows.append([])
        self._cell_parts = []

    def _cell_space(self) -> None:
        if self._cell_parts is not None:
            self._cell_parts.append(" ")

    def _finalize_table(self) -> None:
        self._close_cell()
        lines = []
        for row in self._table_rows:
            cells = [c for c in row if c]
            if cells:
                lines.append("| " + " | ".join(cells) + " |")
        if lines:
            self.blocks.append((
                "\n".join(lines), self._table_chars,
                self._table_link_chars, _TABLE_BLOCK,
            ))
        self._table_rows = []
        self._table_chars = 0
        self._table_link_chars = 0

    def finish(self) -> None:
        """End-of-document: finalize any unterminated table, flush."""
        if self._table_depth:
            self._table_depth = 0
            self._finalize_table()
        self._flush()

    # -- HTMLParser hooks -------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag == "a":
            self.n_links += 1
        if tag == "title":
            self._in_title = True
        elif tag == "h1" and not self.h1_parts:
            self._in_h1 = True
        elif tag == "script" and ("type", "application/ld+json") in attrs:
            self._in_ldjson = True
        if tag in self.drop_tags:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag in STRUCTURE_TAGS:
            self.structure_hits += 1
        if tag == "a":
            self._link_depth += 1
        if self._table_depth:
            if tag == "table":
                self._table_depth += 1
                self._cell_space()
            elif self._table_depth == 1 and tag == "tr":
                self._close_cell()
                self._table_rows.append([])
            elif self._table_depth == 1 and tag in ("td", "th"):
                self._open_cell()
            elif tag in BLOCK_TAGS:
                self._cell_space()
            if tag in BLOCK_TAGS:
                self.block_count += 1
            return
        if tag == "table":
            self.block_count += 1
            self._flush()
            self._table_depth = 1
            self._table_rows = []
            return
        if tag in BLOCK_TAGS:
            self.block_count += 1
            self._flush()
            self._prefix = _PREFIX_TAGS.get(tag, "")

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        # <br/>, <hr/> etc. — block boundary, no subtree.
        if self._drop_depth:
            return
        if self._table_depth:
            if tag in BLOCK_TAGS:
                self.block_count += 1
                self._cell_space()
            return
        if tag in BLOCK_TAGS:
            self.block_count += 1
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag == "title":
            self._in_title = False
        elif tag == "h1":
            self._in_h1 = False
        elif tag == "script":
            self._in_ldjson = False
        if tag in self.drop_tags:
            if self._drop_depth:
                self._drop_depth -= 1
            return
        if self._drop_depth:
            return
        if tag == "a" and self._link_depth:
            self._link_depth -= 1
        if self._table_depth:
            if tag == "table":
                self._table_depth -= 1
                if self._table_depth == 0:
                    self._finalize_table()
                else:
                    self._cell_space()
            elif self._table_depth == 1 and tag in ("td", "th"):
                self._close_cell()
            elif self._table_depth == 1 and tag == "tr":
                self._close_cell()
            elif tag in BLOCK_TAGS:
                self._cell_space()
            return
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self.title_parts.append(data)
        if self._in_h1:
            self.h1_parts.append(data)
        if self._in_ldjson:
            self.ldjson.append(data)
        if self._drop_depth or not data:
            return
        if self._table_depth:
            if self._cell_parts is not None:
                self._cell_parts.append(data)
                n = len(data)
                self._table_chars += n
                if self._link_depth:
                    self._table_link_chars += n
            return
        self._parts.append(data)
        n = len(data)
        self._chars += n
        if self._link_depth:
            self._link_chars += n

    def close(self) -> None:  # noqa: D102
        super().close()
        self.finish()


# ---------------------------------------------------------------------------
# Fast tokenizer: a single-pass regex scanner that drives the SAME
# `_BlockParser` hooks as stdlib `html.parser` but skips its generic
# per-attribute machinery (~6x less tokenize overhead; the hot 92% of the
# extraction kernel per profile). The stdlib path is kept (engine="stdlib")
# and a differential test asserts identical extraction on the corpus.
# ---------------------------------------------------------------------------

# One regex per tag: optional '/', name, quoted/unquoted attrs, optional '/'.
_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9._:-]*)"
    r"((?:\s+[^\s=/>]+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>]*))?)*)"
    r"\s*(/?)\s*>"
)
# Raw-text (CDATA-content) elements: markup/charrefs inert until the end tag,
# matching html.parser's CDATA_CONTENT_ELEMENTS.
_RAWTEXT_END = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}
_LDJSON_ATTRS = (("type", "application/ld+json"),)
_NO_ATTRS: tuple = ()


def _fast_attrs(name: str, attrs_src: str) -> tuple:
    # Only one attribute matters to the block builder: script[type=ld+json].
    if name == "script" and attrs_src and "ld+json" in attrs_src:
        return _LDJSON_ATTRS
    return _NO_ATTRS


def _scan_html(html_text: str, p: _BlockParser) -> None:
    """Tokenize `html_text`, invoking `p`'s handler hooks (hot path)."""
    handle_data = p.handle_data
    n = len(html_text)
    pos = 0
    find = html_text.find
    tag_match = _TAG_RE.match
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            seg = html_text[pos:]
            handle_data(_unescape(seg) if "&" in seg else seg)
            return
        if lt > pos:
            seg = html_text[pos:lt]
            handle_data(_unescape(seg) if "&" in seg else seg)
        m = tag_match(html_text, lt)
        if m is not None:
            closing, name, attrs_src, selfclose = m.groups()
            name = name.lower()
            pos = m.end()
            if closing:
                p.handle_endtag(name)
            elif selfclose:
                p.handle_startendtag(name, _fast_attrs(name, attrs_src))
            else:
                p.handle_starttag(name, _fast_attrs(name, attrs_src))
                raw_end = _RAWTEXT_END.get(name)
                if raw_end is not None:
                    em = raw_end.search(html_text, pos)
                    if em is None:
                        # EOF inside raw text: stdlib emits the rest as data
                        # and never closes the element — mirror that.
                        if pos < n:
                            handle_data(html_text[pos:])
                        return
                    if em.start() > pos:
                        handle_data(html_text[pos:em.start()])
                    gt = find(">", em.end())
                    pos = n if gt < 0 else gt + 1
                    p.handle_endtag(name)
            continue
        nxt = html_text[lt + 1: lt + 2]
        if nxt == "!":
            if html_text.startswith("<!--", lt):
                end = find("-->", lt + 4)
                pos = n if end < 0 else end + 3
            elif html_text.startswith("<![CDATA[", lt):
                end = find("]]>", lt + 9)
                pos = n if end < 0 else end + 3
            else:  # doctype / marked section
                end = find(">", lt + 1)
                pos = n if end < 0 else end + 1
        elif nxt == "?":  # processing instruction
            end = find(">", lt + 1)
            pos = n if end < 0 else end + 1
        else:
            # '<' that opens no tag is literal text.
            handle_data("<")
            pos = lt + 1


def _collapse_ws(raw: str) -> str:
    """Collapse whitespace runs to single spaces (HTML rendering semantics).

    Uses ``str.split()`` so *all* Unicode whitespace collapses, matching
    Python ``str.strip()`` semantics used by the reference for its final
    strip (`ocr_router.py:301`).
    """
    return " ".join(raw.split())


# Charset declaration inside the first 1KB: <meta charset=X> or the legacy
# http-equiv content="text/html; charset=X" form.
_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([A-Za-z0-9_.:-]+)""", re.IGNORECASE
)
# Encodings we honor when declared; everything else falls back to UTF-8
# (errors='replace' keeps the decode total). Names are canonical lowercase.
_KNOWN_CHARSETS = frozenset({
    "utf-8", "utf8", "latin-1", "latin1", "iso-8859-1", "iso8859-1",
    "windows-1252", "cp1252", "ascii", "us-ascii",
})


def decode_payload(data: bytes) -> str:
    """Deterministic byte→str decode; never raises.

    Real Common-Crawl captures declare charsets: honor UTF BOMs first, then
    a ``<meta charset>`` declaration in the first 1KB (the whitelist keeps
    decoding deterministic — an unknown or lying declaration degrades to
    UTF-8-replace instead of raising).
    """
    if data.startswith(b"\xef\xbb\xbf"):
        return data[3:].decode("utf-8", errors="replace")
    if data.startswith(b"\xff\xfe"):
        return data[2:].decode("utf-16-le", errors="replace")
    if data.startswith(b"\xfe\xff"):
        return data[2:].decode("utf-16-be", errors="replace")
    m = _CHARSET_RE.search(data[:1024])
    if m:
        enc = m.group(1).decode("ascii", errors="replace").lower()
        if enc in _KNOWN_CHARSETS and not enc.startswith(("utf-8", "utf8")):
            return data.decode(enc, errors="replace")
    return data.decode("utf-8", errors="replace")


def parse_html_blocks(
    data: bytes,
    drop_tags: frozenset[str] = DROP_TAGS,
    collect_blocks: bool = False,
    engine: str = "fast",
) -> HtmlExtraction:
    """Full extraction pass: returns main text + structure flags.

    ``drop_tags`` narrows/widens the dropped-subtree set (template mining
    passes a minimal set so chrome blocks stay visible); ``collect_blocks``
    additionally returns every collapsed block pre-classification.
    ``engine='stdlib'`` tokenizes via html.parser instead of the fast regex
    scanner — same hooks, kept for differential testing.
    """
    parser = _BlockParser(drop_tags=drop_tags)
    try:
        if engine == "fast":
            _scan_html(decode_payload(data), parser)
            parser.finish()
        else:
            parser.feed(decode_payload(data))
            parser.close()
    except Exception:
        # Tokenizers are tolerant by construction; anything that still
        # escapes is treated as "no further content" (error isolation per
        # `ocr_router.py:296-298` — never abort the document batch).
        parser.finish()

    def _render(raw: str, prefix: object) -> str:
        if prefix is _TABLE_BLOCK:
            return raw  # pre-rendered "| cell | cell |" lines
        text = _collapse_ws(raw)
        if text and prefix:
            text = prefix + text  # markdown li/heading prefix
        return text

    kept: list[str] = []
    kept_pre: list[str] = []
    for raw, chars, link_chars, prefix in parser.blocks:
        text = _render(raw, prefix)
        if not text:
            continue
        density = (link_chars / chars) if chars else 0.0
        if density <= LINK_DENSITY_MAX:
            kept.append(text)
            # same keep decision, format-preserving render: raw text
            # verbatim (tables are pre-rendered lines either way),
            # markdown prefixes still attach
            if prefix is _TABLE_BLOCK:
                kept_pre.append(raw)
            elif prefix:
                kept_pre.append(str(prefix) + raw)
            else:
                kept_pre.append(raw)
    joined = "\n\n".join(kept).strip()
    joined_pre = "\n\n".join(kept_pre).strip()
    all_blocks: tuple[str, ...] = ()
    if collect_blocks:
        all_blocks = tuple(
            t for raw, _c, _l, prefix in parser.blocks
            if (t := _render(raw, prefix))
        )
    has_structure = (
        parser.structure_hits > 0
        or parser.block_count > STRUCTURE_BLOCK_THRESHOLD
    )
    return HtmlExtraction(
        all_blocks=all_blocks,
        text=joined,
        text_pre=joined_pre,
        has_structure=has_structure,
        n_blocks=parser.block_count,
        title=_collapse_ws("".join(parser.title_parts)),
        h1=_collapse_ws("".join(parser.h1_parts)),
        n_links=parser.n_links,
        ldjson=tuple(parser.ldjson),
    )


def extract_html_main_text(data: bytes) -> str:
    """Convenience wrapper returning only the extracted main text."""
    return parse_html_blocks(data).text
