"""Property-based invariants (SURVEY.md §5.2): random block layouts →
extractor never raises, extracted words come from the source, the fast and
stdlib tokenizers agree, and extraction is idempotent on plain text.

Generation stays within well-formed markup over known tags (the
differential contract covers structured HTML; intentionally-divergent
garbage like bare ``<`` data or exotic tag names is covered by the curated
cases in test_functions_pure.py).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ollama_ocr_spark.functions.htmltext import (
    extract_html_main_text,
    parse_html_blocks,
)

_TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="<>&\x00",
        exclude_categories=("Cs",),
    ),
    max_size=40,
)

_INLINE_TAGS = ("span", "b", "i", "a", "em")
_BLOCK_TAGS = ("p", "div", "li", "td", "h2", "blockquote")
_DROP_TAGS = ("nav", "footer", "aside", "script")


def _node(children: st.SearchStrategy) -> st.SearchStrategy:
    tag = st.sampled_from(_INLINE_TAGS + _BLOCK_TAGS + _DROP_TAGS)
    return st.tuples(tag, st.lists(children, max_size=4))


_TREE = st.recursive(_TEXT, _node, max_leaves=25)


def _render(node) -> str:
    if isinstance(node, str):
        return node
    tag, children = node
    inner = "".join(_render(c) for c in children)
    return f"<{tag}>{inner}</{tag}>"


@given(_TREE)
@settings(max_examples=60, deadline=None)
def test_extractor_total_and_tokenizers_agree(tree):
    html = f"<html><body>{_render(tree)}</body></html>".encode()
    fast = parse_html_blocks(html, engine="fast", collect_blocks=True)
    std = parse_html_blocks(html, engine="stdlib", collect_blocks=True)
    assert fast == std
    # extracted content chars all come from the source (inline tags may
    # join adjacent text runs, so containment holds at char level, minus
    # whitespace normalization and markdown decorations)
    source_chars = set(html.decode())
    extracted = set(fast.text) - set(" \n") - set("#|-")
    assert extracted <= source_chars


@given(_TEXT)
@settings(max_examples=40, deadline=None)
def test_plain_text_extraction_idempotent(text):
    first = extract_html_main_text(f"<p>{text}</p>".encode())
    again = extract_html_main_text(f"<p>{first}</p>".encode())
    assert again == first


@given(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=8),
                min_size=1, max_size=60))
@settings(max_examples=60, deadline=None)
def test_memo_layout_collapse_is_identity(words):
    """The printed path's whitespace collapse must invert the handwriting
    layout exactly — the invariant that keeps every collapsed-text mode
    byte-stable while the transcription mode preserves formatting."""
    from ollama_ocr_spark.corpus import memo_layout

    text = " ".join(words)
    laid_out = memo_layout(text)
    assert " ".join(laid_out.split()) == text
    # and the transcription roundtrips through the HTML memo page
    import html as _h

    page = f"<div><p>{_h.escape(laid_out)}</p></div>".encode()
    ext = parse_html_blocks(page)
    assert ext.text_pre == laid_out
    assert ext.text == text


@given(st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00<",
                           exclude_categories=("Cs", "Cc")),
    min_size=1, max_size=300,
))
@settings(max_examples=60, deadline=None)
def test_sniff_accepts_valid_utf8_text_any_size(prefix):
    """Valid UTF-8 plain text must sniff as 'text' regardless of where
    multibyte sequences fall relative to the 4KB probe window."""
    from ollama_ocr_spark.functions.router import sniff_payload

    # place the generated text right at the window edge
    payload = b"a" * (4096 - 150) + prefix.encode() + b" tail" * 50
    kind, err = sniff_payload(payload)
    assert kind == "text", (err, prefix[-8:])
