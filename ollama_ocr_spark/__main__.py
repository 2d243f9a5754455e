"""``python -m ollama_ocr_spark`` — see :mod:`ollama_ocr_spark.cli`."""

from .cli import main

raise SystemExit(main())
