"""Batch transform stages (``map_batches`` bodies) — stateless unless noted."""
