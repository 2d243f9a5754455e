"""Pure-Python scalar/document functions used inside Arrow-vectorized stages.

Nothing in this subpackage imports pyspark — these are the deterministic,
per-document kernels (HTML block scoring, PDF parsing, routing) that the
``operators`` subpackage wraps in ``mapInArrow``.
"""
