"""Sequence-stream sources (SURVEY.md §2.1 S1-S3).

The engine's read path is plain ``ray.data.read_parquet`` — Ray Data streams
Parquet row groups lazily with backpressure, which subsumes the reference's
page-at-a-time reader (``pdf_processor.py:93-128``).  Column pruning is always
applied at the read.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..synth import tokenize_documents_batch

SEQ_COLUMNS = ["doc_id", "tokens", "n_tok", "source", "event_ts"]


def _ensure_event_ts(batch: pa.Table) -> pa.Table:
    """Derive event_ts from doc_id ordering when the stream carries none.

    doc_ids are zero-padded decimal (or suffixed "-docNNN"); the trailing
    integer run is the deterministic event time (SURVEY.md §1.2).
    """
    if "event_ts" in batch.column_names:
        return batch
    ids = batch["doc_id"].to_pylist()
    ts = np.array([int("".join(ch for ch in i if ch.isdigit()) or 0) for i in ids], dtype=np.int64)
    return batch.append_column("event_ts", pa.array(ts, pa.int64()))


def read_sequences(paths: str | list[str], *, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Read a tokenized-sequence Parquet stream; adds event_ts if missing."""
    ds = ray.data.read_parquet(paths, columns=columns)
    names = ds.schema().names
    if "event_ts" not in names:
        ds = ds.map_batches(_ensure_event_ts, batch_format="pyarrow")
    return ds


def read_documents_as_sequences(sf_dir: str) -> "ray.data.Dataset":
    """Deterministically tokenize the driver's ``documents`` table into the
    engine's input schema (codepoint tokens; oracle SQL in __ray_entry__)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return ds.map_batches(tokenize_documents_batch, batch_format="pyarrow")
