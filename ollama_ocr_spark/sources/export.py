"""Reference-format export sinks (golden-contract parity).

The reference writes, per batch run (`/root/reference/ocr_router.py:374-420`):

- one UTF-8 text file per document named ``OCR_{stem}.txt``
  (`ocr_router.py:400-403`; cloud variant ``LLM_{stem}.txt``,
  `ollama_cloud_ocr.py:887-889`),
- a ``summary.csv`` with header ``file,engine,chars,pages,type`` and one row
  per document, error rows as ``[file, 'error', 0, 0, 'error']``
  (`ocr_router.py:386,406-408,414-415`).

These exports exist for fixture/golden interchange with the reference's
output contract — the cluster-scale sinks are the icetbl results/metrics
tables. Export is driver-side by design (goldens are small); it fails loudly
on large inputs rather than silently collecting a terabyte.
"""

from __future__ import annotations

import csv
import os
import re

from pyspark.sql import DataFrame

MAX_EXPORT_ROWS = 100_000


def _stem(url: str) -> str:
    name = url.rsplit("/", 1)[-1]
    return re.sub(r"\.[A-Za-z0-9]+$", "", name)


def export_reference_outputs(results: DataFrame, out_dir: str,
                             prefix: str = "OCR",
                             write_csv: bool = True) -> str:
    """Write per-doc text files + summary.csv in the reference's format.

    Returns the summary.csv path (written only when ``write_csv`` — the
    reference's batch mode always writes the text files but gates the CSV
    behind ``--csv``, `ocr_router.py:381-386`). Deterministic order (sorted
    by url — the analog of the reference's sorted directory scan).
    """
    os.makedirs(out_dir, exist_ok=True)
    rows = (
        results.select("url", "engine", "text", "chars", "pages", "doc_type")
        .orderBy("url")
        .limit(MAX_EXPORT_ROWS + 1)
        .collect()
    )
    if len(rows) > MAX_EXPORT_ROWS:
        raise ValueError(
            f"export is a golden/fixture sink (≤{MAX_EXPORT_ROWS} rows); "
            "use the icetbl results table for bulk output"
        )
    csv_path = os.path.join(out_dir, "summary.csv")
    fh = open(csv_path, "w", newline="", encoding="utf-8") if write_csv else None
    try:
        writer = csv.writer(fh) if fh else None
        if writer:
            writer.writerow(["file", "engine", "chars", "pages", "type"])
        for r in rows:
            stem = _stem(r["url"])
            if r["engine"] == "error":
                # error-row contract: ocr_router.py:414-415
                if writer:
                    writer.writerow([stem, "error", 0, 0, "error"])
                continue
            with open(os.path.join(out_dir, f"{prefix}_{stem}.txt"),
                      "w", encoding="utf-8") as tf:
                tf.write(r["text"])
            if writer:
                writer.writerow(
                    [stem, r["engine"], r["chars"], r["pages"], r["doc_type"]]
                )
    finally:
        if fh:
            fh.close()
    return csv_path
