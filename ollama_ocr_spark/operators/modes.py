"""Analysis modes (reference T8-T10, `ollama_cloud_ocr.py:381-599`) as
Arrow-vectorized struct-output stages.

The reference's cloud client re-encodes and re-sends the image per mode;
its one optimization is encoding once for multi-step analysis
(`ollama_cloud_ocr.py:558`). Here the analog is structural: the HTML is
parsed ONCE per document (``parse_html_blocks`` captures text, title, h1,
link counts and JSON-LD in a single pass) and every mode reads from that
parse — Catalyst can't CSE across Python UDF calls, so the sharing lives
inside the kernel (SURVEY.md §4).

- :func:`structured_stage`  — T8: schema.org JSON-LD receipt fields
  (store_name, date, total_cents, n_items), the web-native analog of the
  reference's receipt prompt schema (`ollama_cloud_ocr.py:403`).
- :func:`analyze_stage`     — T9: document metadata (title, h1, block/link
  stats, structure class).
- :func:`multi_step_stage`  — T10: one pass → all of text + metadata +
  structured fields, with per-step error capture.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame

from ..functions.htmltext import parse_html_blocks
from ..functions.router import sniff_payload

_TS = pa.timestamp("us", tz="UTC")


def _first_typed(ext, ld_type: str) -> dict | None:
    for raw in ext.ldjson:
        try:
            obj = json.loads(raw)
        except ValueError:
            continue
        if isinstance(obj, dict) and obj.get("@type") == ld_type:
            return obj
    return None


_first_receipt = lambda ext: _first_typed(ext, "Receipt")  # noqa: E731


# Per --data-type field schemas (reference `ollama_cloud_ocr.py:401-414`,
# CLI choices `:694-695`): JSON-LD @type to match + typed output columns.
_STRUCTURED_TYPES = {
    "receipt": ("Receipt", [
        ("store_name", pa.string()),
        ("date", pa.string()),
        ("total_cents", pa.int64()),
        ("n_items", pa.int32()),
    ]),
    "form": ("Form", [
        ("form_name", pa.string()),
        ("n_fields", pa.int32()),
        ("contact_email", pa.string()),
    ]),
    "price_tag": ("PriceTag", [
        ("product_name", pa.string()),
        ("price_cents", pa.int64()),
        ("sku", pa.string()),
    ]),
}

_PA_DDL = {pa.string(): "string", pa.int64(): "bigint", pa.int32(): "int"}


def structured_stage(pages: DataFrame,
                     data_type: str = "receipt") -> DataFrame:
    """Extract schema.org JSON-LD fields for one ``data_type``
    (receipt/form/price_tag — the reference's ``--data-type`` table,
    `ollama_cloud_ocr.py:401-414`). Pages without that type yield an
    error row ('no structured data found'), mirroring the reference's
    unparseable-response path."""
    if data_type not in _STRUCTURED_TYPES:
        raise ValueError(f"Unsupported data type: {data_type}")
    ld_type, fields = _STRUCTURED_TYPES[data_type]
    schema = pa.schema(
        [("url", pa.string()), *fields, ("error", pa.string())]
    )

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in it:
            urls = rb.column(rb.schema.get_field_index("url")).to_pylist()
            payloads = rb.column(rb.schema.get_field_index("html")).to_pylist()
            cols: dict[str, list] = {f.name: [] for f in schema}
            for url, payload in zip(urls, payloads):
                kind, _err = sniff_payload(payload)
                rec = None
                err = None
                if kind == "html":
                    rec = _first_typed(parse_html_blocks(payload), ld_type)
                    if rec is None:
                        err = "no structured data found"
                else:
                    err = "unsupported payload for structured mode"
                cols["url"].append(url)
                for name, _t in fields:
                    cols[name].append(rec.get(name) if rec else None)
                cols["error"].append(err)
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[f.name], type=f.type) for f in schema],
                schema=schema,
            )

    ddl = ", ".join(
        ["url string"]
        + [f"{name} {_PA_DDL[t]}" for name, t in fields]
        + ["error string"]
    )
    return pages.select("url", "html").mapInArrow(batches, ddl)


_ANALYZE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("title", pa.string()),
        ("h1", pa.string()),
        ("n_blocks", pa.int32()),
        ("n_links", pa.int32()),
        ("has_structure", pa.bool_()),
        ("doc_class", pa.string()),
    ]
)


def _analyze_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for rb in batches:
        urls = rb.column(rb.schema.get_field_index("url")).to_pylist()
        payloads = rb.column(rb.schema.get_field_index("html")).to_pylist()
        cols = {f.name: [] for f in _ANALYZE_SCHEMA}
        for url, payload in zip(urls, payloads):
            kind, _ = sniff_payload(payload)
            if kind != "html":
                cols["url"].append(url)
                cols["title"].append("")
                cols["h1"].append("")
                cols["n_blocks"].append(0)
                cols["n_links"].append(0)
                cols["has_structure"].append(False)
                cols["doc_class"].append(kind or "error")
                continue
            ext = parse_html_blocks(payload)
            cols["url"].append(url)
            cols["title"].append(ext.title)
            cols["h1"].append(ext.h1)
            cols["n_blocks"].append(ext.n_blocks)
            cols["n_links"].append(ext.n_links)
            cols["has_structure"].append(ext.has_structure)
            cols["doc_class"].append(
                "structured" if ext.has_structure else "plain"
            )
        yield pa.RecordBatch.from_arrays(
            [pa.array(cols[f.name], type=f.type) for f in _ANALYZE_SCHEMA],
            schema=_ANALYZE_SCHEMA,
        )


def analyze_stage(pages: DataFrame) -> DataFrame:
    """Document-metadata mode (doc type, title, headings, layout stats)."""
    return pages.select("url", "html").mapInArrow(
        _analyze_batches,
        "url string, title string, h1 string, n_blocks int, n_links int, "
        "has_structure boolean, doc_class string",
    )


_MULTI_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("text", pa.string()),
        ("chars", pa.int64()),
        ("title", pa.string()),
        ("has_receipt", pa.bool_()),
        ("total_cents", pa.int64()),
        ("step_errors", pa.string()),
    ]
)


def _multi_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for rb in batches:
        urls = rb.column(rb.schema.get_field_index("url")).to_pylist()
        payloads = rb.column(rb.schema.get_field_index("html")).to_pylist()
        cols = {f.name: [] for f in _MULTI_SCHEMA}
        for url, payload in zip(urls, payloads):
            errors: list[str] = []
            kind, err = sniff_payload(payload)
            text, title, rec = "", "", None
            if kind == "html":
                # ONE parse feeds every step (per-step error capture as in
                # `ollama_cloud_ocr.py:574-597`)
                ext = parse_html_blocks(payload)
                text, title = ext.text, ext.title
                rec = _first_receipt(ext)
            elif kind == "text":
                # plain-text capture: the text step succeeds, the
                # structure-dependent steps are simply absent
                text = payload.decode("utf-8", errors="replace").strip()
            else:
                errors.append(f"text: {err or 'non-html payload'}")
            cols["url"].append(url)
            cols["text"].append(text)
            cols["chars"].append(len(text))
            cols["title"].append(title)
            cols["has_receipt"].append(rec is not None)
            cols["total_cents"].append(rec.get("total_cents") if rec else None)
            cols["step_errors"].append("; ".join(errors) if errors else None)
        yield pa.RecordBatch.from_arrays(
            [pa.array(cols[f.name], type=f.type) for f in _MULTI_SCHEMA],
            schema=_MULTI_SCHEMA,
        )


def multi_step_stage(pages: DataFrame) -> DataFrame:
    """All analysis steps in one parse pass (T10)."""
    return pages.select("url", "html").mapInArrow(
        _multi_batches,
        "url string, text string, chars bigint, title string, "
        "has_receipt boolean, total_cents bigint, step_errors string",
    )
