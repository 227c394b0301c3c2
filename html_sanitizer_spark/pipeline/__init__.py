"""Batch pipeline: read -> salt -> explode -> sanitize -> reassemble -> write,
with per-partition lineage and checkpoint/resume."""
