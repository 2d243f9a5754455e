"""Routing + per-document extraction core (the engine's "query optimizer").

Re-expresses the reference's routing decision table as pure functions:

- payload sniff (magic bytes) ↔ extension filter + is-PDF predicate
  (`/root/reference/ocr_router.py:97,100-102`),
- URL-keyword fast path ↔ filename-keyword heuristic
  (`ocr_router.py:140-144`: receipt/invoice/form/document/pdf → printed;
  handwriting/handwritten/note/notes/draft → handwriting),
- HTML structure heuristic ↔ HoughLinesP straight-line count
  (`ocr_router.py:160-170`: many lines → printed, default → handwriting),
- PDF page fold with byte-exact separators `"\\n\\n--- Page {n} ---\\n\\n"`
  and error strings `"[Error processing page: {e}]"`
  (`ocr_router.py:294,298,301`),
- error rows `(engine='error', chars=0, pages=0, type='error')`
  (`ocr_router.py:414-415`).

Everything here is deterministic and exception-free by construction: errors
become data (an ``error`` column), never task failures — the per-doc
try/except error-isolation model of `ocr_router.py:412-415`.
"""

from __future__ import annotations

from dataclasses import dataclass

from .htmltext import parse_html_blocks
from .pdfmini import PdfError, extract_pdf_pages

# Keyword fast paths, value sets from `ocr_router.py:140-144`.
PRINTED_KEYWORDS = ("receipt", "invoice", "form", "document", "pdf")
HANDWRITING_KEYWORDS = ("handwriting", "handwritten", "note", "notes", "draft")

ENGINE_PRINTED = "printed"
ENGINE_HANDWRITING = "handwriting"
ENGINE_ERROR = "error"

TYPE_HTML = "HTML"
TYPE_PDF = "PDF"
TYPE_IMAGE = "Image"
TYPE_TEXT = "Text"
TYPE_ERROR = "error"

# Plain-text acceptance: strict UTF-8 and no control bytes beyond \t\n\r —
# anything binary-ish stays an error row (the corpus' junk captures carry
# \x00 and must keep their error contract).
_TEXT_FORBIDDEN = set(range(0x00, 0x20)) - {0x09, 0x0A, 0x0D}

PAGE_SEP_FMT = "\n\n--- Page {n} ---\n\n"          # ocr_router.py:294
PAGE_ERR_FMT = "[Error processing page: {e}]"       # ocr_router.py:298


def _default_image_ocr(payload: bytes) -> str:
    """In-sandbox image-text kernel: REAL header-level parse of embedded
    comment text (JPEG COM / PNG tEXt — corpus fixtures carry their golden
    text there). This is the documented stand-in for pixel OCR; see
    :data:`OCR_KERNELS` for the production swap seam."""
    from .media import image_comment_text

    return image_comment_text(payload)


# Swap seam for the ONE non-reproduced reference semantic (pixel-level OCR,
# `ocr_router.py:38-46,76-86` Tesseract/TrOCR — no codec libs in-sandbox):
# sniffed payload kind → text-kernel fn. Production drops in a real OCR
# engine with `register_ocr_kernel("image", my_tesseract_fn)`; routing,
# error isolation, page folding, and the Arrow batching above this seam
# are unchanged. NOTE: Spark workers import this module from the shipped
# package zip, so register the kernel at module import time (a wrapper
# module in --py-files), not per-driver-session.
OCR_KERNELS: dict[str, object] = {"image": _default_image_ocr}


def register_ocr_kernel(kind: str, fn) -> None:
    """Register a text-extraction kernel for a sniffed payload kind
    (currently ``"image"``). ``fn(payload: bytes) -> str``."""
    OCR_KERNELS[kind] = fn


@dataclass
class ExtractResult:
    engine: str
    text: str
    chars: int
    pages: int
    doc_type: str
    error: str | None


def sniff_payload(data: bytes | None) -> tuple[str | None, str | None]:
    """(kind, error): kind ∈ {'pdf','image','html'} or None with a reason.

    The distributed analog of the extension filter — content-type from magic
    bytes instead of file suffix, evaluated before any expensive parse.
    """
    if data is None or len(data) == 0:
        return None, "empty payload"
    if data.startswith(b"%PDF"):
        return "pdf", None
    if data.startswith(b"\xff\xd8\xff") or data.startswith(b"\x89PNG\r\n\x1a\n"):
        return "image", None
    head = data[:256].lstrip().lower()
    if head.startswith(b"<!doctype") or head.startswith(b"<html") or head.startswith(b"<"):
        return "html", None
    probe = data[:4096]
    if len(data) > 4096:
        # Don't split a multibyte char at the window edge: strip trailing
        # UTF-8 continuation bytes (0b10xxxxxx) plus at most one lead byte.
        # (A fixed-width trim can itself cut a sequence straddling the new
        # boundary — e.g. a 4-byte char at 4090-4093 loses its last byte —
        # misrouting valid >4KB non-ASCII text to an error row.)
        cut = len(probe)
        while cut > 0 and len(probe) - cut < 3 and probe[cut - 1] & 0xC0 == 0x80:
            cut -= 1
        if cut > 0 and probe[cut - 1] >= 0xC0:
            cut -= 1
        probe = probe[:cut]
    if not any(b in _TEXT_FORBIDDEN for b in probe):
        try:
            probe.decode("utf-8")
        except UnicodeDecodeError:
            return None, "unrecognized payload"
        return "text", None
    return None, "unrecognized payload"


def keyword_route(url: str) -> str | None:
    """URL-keyword fast path; printed keywords win (checked first, as in
    `ocr_router.py:140-144`). Returns None when no keyword matches."""
    name = url.rsplit("/", 1)[-1].lower()
    if any(k in name for k in PRINTED_KEYWORDS):
        return ENGINE_PRINTED
    if any(k in name for k in HANDWRITING_KEYWORDS):
        return ENGINE_HANDWRITING
    return None


def fold_pages(page_texts: list[str]) -> str:
    """Byte-exact page fold: decorate + join + strip (`ocr_router.py:294-301`)."""
    return "".join(
        PAGE_SEP_FMT.format(n=n) + t for n, t in enumerate(page_texts, 1)
    ).strip()


def _error(msg: str) -> ExtractResult:
    # Error-row contract: `['file','error',0,0,'error']` (ocr_router.py:415).
    return ExtractResult(
        engine=ENGINE_ERROR, text="", chars=0, pages=0,
        doc_type=TYPE_ERROR, error=msg,
    )


def extract_document(url: str, payload: bytes | None) -> ExtractResult:
    """Route + extract one document. Pure, deterministic, never raises."""
    kind, err = sniff_payload(payload)
    if kind is None:
        return _error(err or "unrecognized payload")

    kw_engine = keyword_route(url)

    if kind == "pdf":
        try:
            pages = extract_pdf_pages(payload)  # type: ignore[arg-type]
        except PdfError as exc:
            return _error(str(exc))
        if not pages:
            # mirrors `ValueError("No pages found in PDF")` → doc error row
            # (ocr_router.py:270-271 via 412-415)
            return _error("no pages found in pdf")
        text = fold_pages(pages)
        return ExtractResult(
            engine=kw_engine or ENGINE_PRINTED, text=text, chars=len(text),
            pages=len(pages), doc_type=TYPE_PDF, error=None,
        )

    if kind == "text":
        # Plain-text capture: no markup to strip; Python str.strip()
        # mirrors the reference's final strip (`ocr_router.py:301`). No
        # structure markers → fallback class, like the reference's
        # unreadable-image default.
        text = payload.decode("utf-8", errors="replace").strip()  # type: ignore[union-attr]
        return ExtractResult(
            engine=kw_engine or ENGINE_HANDWRITING, text=text,
            chars=len(text), pages=1, doc_type=TYPE_TEXT, error=None,
        )

    if kind == "image":
        # Image text extraction (reference Tesseract/TrOCR path,
        # `ocr_router.py:38-46,76-86`) through the OCR_KERNELS swap seam —
        # in-sandbox the kernel is the header comment-text parse; a
        # production OCR engine is a one-function drop-in
        # (register_ocr_kernel). Images route to the fallback class like
        # the reference's unreadable-image default (`ocr_router.py:132-174`).
        text = OCR_KERNELS["image"](payload).strip()  # type: ignore[operator]
        return ExtractResult(
            engine=kw_engine or ENGINE_HANDWRITING, text=text,
            chars=len(text), pages=1, doc_type=TYPE_IMAGE, error=None,
        )

    # HTML main-content extraction (the "printed OCR" analog).
    extraction = parse_html_blocks(payload)  # type: ignore[arg-type]
    engine = kw_engine or (
        ENGINE_PRINTED if extraction.has_structure else ENGINE_HANDWRITING
    )
    # T7 (`ollama_cloud_ocr.py:310-379`): the handwriting class is a
    # TRANSCRIPTION — "maintain original formatting" — so it takes the
    # format-preserving render (intra-block whitespace verbatim) of the
    # same kept blocks; printed keeps the whitespace-collapsed render.
    # Both renders come from the ONE parse pass.
    text = (
        extraction.text_pre if engine == ENGINE_HANDWRITING
        else extraction.text
    )
    return ExtractResult(
        engine=engine, text=text, chars=len(text),
        pages=1, doc_type=TYPE_HTML, error=None,
    )
