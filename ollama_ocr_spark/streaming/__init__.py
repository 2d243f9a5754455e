"""Structured Streaming execution mode for the same extraction pipeline."""
