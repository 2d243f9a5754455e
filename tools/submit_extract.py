#!/usr/bin/env python3
"""spark-submit driver for the extraction pipeline (north-rule deployment
path: ``spark-submit --py-files engine.zip tools/submit_extract.py ...``).

The job body is the same CLI the local mode runs (`ollama_ocr_spark.cli`);
`get_spark` calls `getOrCreate`, so the master/conf spark-submit provides
win over the library defaults, and the package zip shipped via --py-files
makes the mapInArrow kernels importable on every executor. Run
``tools/submit.sh --help`` for the packaged invocation.
"""

from __future__ import annotations

import sys


def main() -> int:
    from ollama_ocr_spark.cli import main as cli_main

    return cli_main()


if __name__ == "__main__":
    raise SystemExit(main())
