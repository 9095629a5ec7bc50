"""End-to-end pipelines: CDC replay, metrics, and the query catalog."""
