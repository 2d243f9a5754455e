"""Arrow-vectorized extraction + corpus-synthesis stages (``mapInArrow``).

The whole router+extractor (reference operators R1-R3, T1-T5 in SURVEY.md §2)
runs as ONE ``mapInArrow`` stage: the JVM ships Arrow record batches to the
Python worker, the per-document kernels run batch-at-a-time, and results go
back as Arrow — no row-at-a-time serialization, no per-row Python at the
DataFrame level (parsers and regexes are compiled once per module import,
i.e. once per worker process — the warm-engine-reuse semantic of
`/root/reference/ocr_router.py:389`).

Stages:

- :func:`synthesize_stage` — documents rows → deterministic pages rows
  (fixture synthesis, corpus.py), used by tests/bench/driver queries.
- :func:`extract_stage` — pages rows → extraction results
  ``(url, warc_ts, lang, bytes_in, engine, text, chars, pages, doc_type,
  error)``.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame

from ..corpus import capture_rows
from ..functions.router import extract_document

EXTRACT_SCHEMA = (
    "url string, warc_ts timestamp, lang string, bytes_in bigint, "
    "engine string, text string, chars bigint, pages int, "
    "doc_type string, error string, parse_us bigint"
)

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_PA_TS = pa.timestamp("us", tz="UTC")

_PAGES_PA_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", _PA_TS),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EXTRACT_PA_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", _PA_TS),
        ("lang", pa.string()),
        ("bytes_in", pa.int64()),
        ("engine", pa.string()),
        ("text", pa.string()),
        ("chars", pa.int64()),
        ("pages", pa.int32()),
        ("doc_type", pa.string()),
        ("error", pa.string()),
        ("parse_us", pa.int64()),
    ]
)


def _extract_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    # Only url + html are materialized into Python (the kernel needs them);
    # warc_ts and lang PASS THROUGH as Arrow arrays. Materializing a
    # tz-aware timestamp column via to_pylist costs ~30us/row — half the
    # per-doc budget of the whole extraction kernel (~80us/doc) — because
    # every element becomes a fresh tzinfo-carrying datetime object.
    for rb in batches:
        url_arr = rb.column(rb.schema.get_field_index("url")).cast(pa.string())
        ts_arr = rb.column(rb.schema.get_field_index("warc_ts")).cast(_PA_TS)
        lang_arr = rb.column(rb.schema.get_field_index("lang")).cast(pa.string())
        urls = url_arr.to_pylist()
        payloads = rb.column(rb.schema.get_field_index("html")).to_pylist()

        out: dict[str, list] = {k: [] for k in (
            "bytes_in", "engine", "text", "chars", "pages", "doc_type",
            "error", "parse_us",
        )}
        for url, payload in zip(urls, payloads):
            t0 = time.perf_counter_ns()
            r = extract_document(url, payload)
            out["parse_us"].append((time.perf_counter_ns() - t0) // 1000)
            out["bytes_in"].append(len(payload) if payload is not None else 0)
            out["engine"].append(r.engine)
            out["text"].append(r.text)
            out["chars"].append(r.chars)
            out["pages"].append(r.pages)
            out["doc_type"].append(r.doc_type)
            out["error"].append(r.error)
        yield pa.RecordBatch.from_arrays(
            [url_arr, ts_arr, lang_arr]
            + [pa.array(out[f.name], type=f.type)
               for f in _EXTRACT_PA_SCHEMA if f.name in out],
            schema=_EXTRACT_PA_SCHEMA,
        )


def extract_stage(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, ..., lang) → extraction results.

    Column-prunes to exactly the 4 columns the kernel needs *before* the
    Arrow exchange, so Parquet scans never materialize unused columns into
    Python (Catalyst prunes the file scan; this select prunes the IPC).
    """
    pruned = pages.select("url", "warc_ts", "html", "lang")
    return pruned.mapInArrow(_extract_batches, EXTRACT_SCHEMA)


def _synthesize_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for rb in batches:
        doc_ids = rb.column(rb.schema.get_field_index("doc_id")).to_pylist()
        texts = rb.column(rb.schema.get_field_index("text")).to_pylist()
        langs = rb.column(rb.schema.get_field_index("lang")).to_pylist()
        sources = rb.column(rb.schema.get_field_index("source")).to_pylist()

        cols: dict[str, list] = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
        for doc_id, text, lang, source in zip(doc_ids, texts, langs, sources):
            for row in capture_rows(int(doc_id), text, lang, source):
                for key, val in zip(cols, row):
                    cols[key].append(val)
        yield pa.RecordBatch.from_arrays(
            [pa.array(cols[f.name], type=f.type) for f in _PAGES_PA_SCHEMA],
            schema=_PAGES_PA_SCHEMA,
        )


def synthesize_stage(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, ...) → deterministic pages rows."""
    pruned = documents.select("doc_id", "text", "lang", "source")
    return pruned.mapInArrow(_synthesize_batches, PAGES_SCHEMA)
