"""Command-line entry: the Spark-native equivalent of the reference CLIs.

Flag-for-flag analog of `python ocr_router.py [file] --engine --outdir
--csv` (`/root/reference/ocr_router.py:313-339`), re-expressed over the
cluster data model:

- input is a *pages table* (parquet dir of ``url, warc_ts, html, text,
  lang`` rows) instead of an ``images/`` directory; ``--synthesize`` accepts
  a ``documents`` table and builds the deterministic pages corpus from it,
- single-file mode (positional file path) becomes ``--url`` (process one
  document, print a 400-char preview — the reference's console sink,
  `ocr_router.py:410-411`),
- ``--engine`` overrides the routed engine label for non-error rows
  (`ocr_router.py:323-328`),
- batch outputs land in icetbl results/metrics tables under ``--workdir``
  (resumable: a re-run extracts nothing new), and ``--outdir`` additionally
  exports the reference's byte-format ``OCR_{stem}.txt`` files with
  ``summary.csv`` behind ``--csv`` (`ocr_router.py:374-420`).

Run: ``python -m ollama_ocr_spark --input .../documents.parquet
--synthesize --workdir /tmp/run --outdir /tmp/run/outputs --csv``
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import functions as F

PREVIEW_CHARS = 400  # ocr_router.py:410 truncates the console echo


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ollama_ocr_spark",
        description=(
            "Route + extract main content from a pages table "
            "(HTML/PDF/image payloads). Spark-native batch analog of "
            "ocr_router.py."
        ),
    )
    p.add_argument("--input", required=True,
                   help="pages parquet dir, or a documents table with "
                        "--synthesize")
    p.add_argument("--synthesize", action="store_true",
                   help="input is a documents table; build the "
                        "deterministic pages corpus from it")
    p.add_argument("--url", default=None,
                   help="process a single document (single-file mode)")
    p.add_argument("--engine", choices=["auto", "printed", "handwriting"],
                   default="auto",
                   help="engine label override (default: auto routing)")
    p.add_argument("--mode",
                   choices=["extract", "structured", "analyze", "multi"],
                   default="extract",
                   help="analysis mode (ollama_cloud_ocr.py --mode analog): "
                        "extract=main text; structured=receipt fields; "
                        "analyze=document metadata; multi=one-parse "
                        "multi-step")
    p.add_argument("--workdir", default="ocr_run",
                   help="icetbl results/metrics tables root (resume anchor)")
    p.add_argument("--outdir", default=None,
                   help="also export reference-format OCR_{stem}.txt files")
    p.add_argument("--csv", action="store_true",
                   help="with --outdir: write summary.csv too")
    p.add_argument("--master", default=None,
                   help="Spark master (default: local[$SPARK_GRAFT_CPUS])")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from .operators.extract import synthesize_stage
    from .pipeline import run_extract
    from .session import get_spark
    from .sources.export import export_reference_outputs
    from .sources.icetbl import IceTable

    spark = get_spark(app="ollama-ocr-spark-cli", master=args.master)
    pages = spark.read.parquet(args.input)
    if args.synthesize:
        pages = synthesize_stage(pages)
    if args.url:
        pages = pages.filter(F.col("url") == args.url)

    if args.mode != "extract":
        # cloud-CLI mode dispatch (ollama_cloud_ocr.py:744-788): run the
        # parameterized analysis stage, commit to its own icetbl table.
        from .operators import modes as _modes

        stage = {
            "structured": _modes.structured_stage,
            "analyze": _modes.analyze_stage,
            "multi": _modes.multi_step_stage,
        }[args.mode]
        out = stage(pages)
        tbl = IceTable(os.path.join(args.workdir, args.mode))
        sid = tbl.append(out)
        if args.url:
            row = tbl.read(spark).filter(F.col("url") == args.url).first()
            if row is None:
                print(f"no document for url: {args.url}", file=sys.stderr)
                return 1
            for field, val in row.asDict().items():
                print(f"{field}: {val}")
        else:
            print(f"{args.mode}: {tbl.read(spark).count()} rows -> "
                  f"{tbl.root} (snapshot {sid})")
        return 0

    results_tbl = IceTable(os.path.join(args.workdir, "results"))
    metrics_tbl = IceTable(os.path.join(args.workdir, "metrics"))
    stats = run_extract(spark, pages, results_tbl, metrics_tbl)

    results = results_tbl.read(spark)
    if args.engine != "auto" and results is not None:
        # `--engine` forces the label the reference would force
        # (ocr_router.py:323-328); error rows keep their contract.
        results = results.withColumn(
            "engine",
            F.when(F.col("engine") == "error", "error")
            .otherwise(F.lit(args.engine)),
        )

    if args.url and results is not None:
        row = results.filter(F.col("url") == args.url).first()
        if row is None:
            print(f"no document for url: {args.url}", file=sys.stderr)
            return 1
        text = row["text"] or ""
        preview = text[:PREVIEW_CHARS] + ("..." if len(text) > PREVIEW_CHARS else "")
        print(f"[{row['engine']}] {row['url']} "
              f"({row['chars']} chars, {row['pages']} page(s))")
        print(preview)
    else:
        print(f"extracted {stats.docs_extracted} new / "
              f"{stats.docs_in} docs -> {results_tbl.root} "
              f"(snapshot {stats.snapshot_id})")

    if args.outdir and results is not None:
        export_reference_outputs(results, args.outdir, write_csv=args.csv)
        print(f"reference-format outputs in {args.outdir}"
              + (" (+ summary.csv)" if args.csv else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
