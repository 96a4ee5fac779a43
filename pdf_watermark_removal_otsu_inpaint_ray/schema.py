"""Arrow schemas for the engine (SURVEY.md §1.2; BASELINE.json input_hint)."""

from __future__ import annotations

import pyarrow as pa

# The one logical input stream: pre-tokenized training sequences.
SEQ_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),           # unique row key
        ("tokens", pa.list_(pa.int32())),  # token ids (>= 0); gray = tok % 256
        ("n_tok", pa.int32()),             # invariant: n_tok == len(tokens)
        ("source", pa.string()),           # keyed-state key (Zipf-skewed)
    ]
)

# Ingest adds event time (monotone per source with bounded disorder).
SEQ_SCHEMA_TS = SEQ_SCHEMA.append(pa.field("event_ts", pa.int64()))

# Span events emitted by the motif/CEP stage (analog of QRCodeInfo,
# reference qr_detector.py:26-36).
SPAN_EVENT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("source", pa.string()),
        ("span_start", pa.int32()),
        ("span_len", pa.int32()),
        ("category", pa.string()),
        ("confidence", pa.float64()),
    ]
)

# Per-(source, window) detection results (the small broadcast side).
WM_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("window_id", pa.int64()),
        ("wm_token", pa.int32()),   # -1 == no watermark detected
        ("coverage_pct", pa.float64()),
    ]
)

# Lineage-manifest rows for the exactly-once sink (SURVEY.md §4.2).
MANIFEST_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("input_fingerprint", pa.string()),
        ("output_file", pa.string()),
        ("row_count", pa.int64()),
        ("committed", pa.bool_()),
    ]
)
