"""Incremental (Structured Streaming) variant of the sanitize pipeline."""
