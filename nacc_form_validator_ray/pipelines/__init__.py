"""End-to-end pipelines: synthetic page generation, the flagship web-text
quality filter, dedup and similarity flows."""
