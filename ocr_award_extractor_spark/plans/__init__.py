"""Job planning: per-partition lineage, commit batching, resume anti-join."""
