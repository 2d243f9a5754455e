"""Spark DataFrame operators: Arrow-vectorized extraction, dedup families,
similarity search, maintenance (dedup/resume/salting) and reports."""
