"""End-to-end pipelines built from the operator surface."""
