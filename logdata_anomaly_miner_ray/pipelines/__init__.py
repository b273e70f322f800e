"""End-to-end pipelines: the flagship web-pages validation suite."""
