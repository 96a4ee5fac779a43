"""Deterministic synthetic sequence streams + documents-derived tokenization.

Two input paths, both producing the authoritative schema
``(doc_id, tokens, n_tok, source [, event_ts])`` (BASELINE.json input_hint):

* :func:`generate_stream` / :func:`write_stream` — fixed-seed synthetic
  generator planting background / watermark / content token bands per
  FIXTURES.md, used by unit tests and the benchmark.  The planted bands
  mirror the reference's pixel-value semantics
  (watermark_detector.py:181 — watermark gray 100-250 at 1-20% coverage;
  :207 — text <= 140; :455 — background > 250).
* :func:`tokenize_documents_batch` — deterministic codepoint tokenization of
  the driver-provided ``documents`` table, so every engine operator has a
  DuckDB-expressible oracle (``unicode()`` over ``regexp_extract_all(text,'.')``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .config import DEFAULT_CONFIG, EngineConfig

# Token bands (FIXTURES.md)
BACKGROUND_GRAY = 252   # > background_threshold 250 -> protected
CONTENT_LO, CONTENT_HI = 0, 100   # deep content band (always text-protected)

# Motif marker prefixes (token-space analog of QR payload prefixes,
# qr_detector.py:92-121).  Each motif is MARKER_PREFIX + category_code +
# payload_len + payload tokens.  Values chosen > 255 so markers never
# collide with the gray bands (gray = tok % 256 still lands in-band).
MOTIF_PREFIX = (300, 301, 302)
MOTIF_CATEGORIES = ("website", "advertisement", "documentation", "email", "general")


def _zipf_sources(rng: np.random.Generator, n_rows: int, n_sources: int, a: float = 1.1) -> np.ndarray:
    """Zipf-skewed source index per row (SURVEY.md §4.2 skew note)."""
    ranks = np.arange(1, n_sources + 1, dtype=np.float64)
    p = ranks ** (-a)
    p /= p.sum()
    return rng.choice(n_sources, size=n_rows, p=p)


def generate_stream(
    n_rows: int,
    *,
    seed: int = 42,
    n_sources: int = 8,
    n_tok_lo: int = 64,
    n_tok_hi: int = 512,
    disorder: int = 8,
    rows_per_ts: int = 4,
    wm_coverage: float = 0.08,
    plant_motifs: bool = False,
    motif_every: int = 13,
    cfg: EngineConfig = DEFAULT_CONFIG,
    start_row: int = 0,
) -> pa.Table:
    """Deterministic synthetic stream chunk (rows ``start_row .. start_row+n_rows``).

    Each row: ~30% deep-content tokens, ~62% background tokens, and 1-3
    contiguous spans of the (source, window)-specific watermark token at
    ``wm_coverage`` total coverage.  The watermark token is
    ``100 + hash(source, window) % 151`` — inside the reference's candidate
    band [100, 250].  ``event_ts`` advances one unit per ``rows_per_ts`` rows
    with per-row jitter <= ``disorder`` (bounded disorder, §2.9).

    Chunked determinism: calling this with any ``start_row`` split yields
    the same rows as one big call — the per-row RNG is seeded from
    ``(seed, global_row_index)``.
    """
    ids, toks, ntoks, srcs, tss = [], [], [], [], []
    for gi in range(start_row, start_row + n_rows):
        rng = np.random.default_rng((seed, gi))
        s_idx = int(_zipf_sources(rng, 1, n_sources)[0])
        source = f"src{s_idx:02d}"
        ts = gi // rows_per_ts + int(rng.integers(0, disorder + 1))
        window = ts // cfg.window_size
        wm = 100 + (hash_u32(s_idx * 1_000_003 + window) % 151)

        n = int(rng.integers(n_tok_lo, n_tok_hi + 1))
        gray = np.full(n, BACKGROUND_GRAY, dtype=np.int32)
        # content runs (~30%): a few runs of deep-content tokens
        n_content = max(1, int(n * 0.3) // 16)
        for _ in range(n_content):
            cstart = int(rng.integers(0, max(1, n - 16)))
            clen = int(rng.integers(8, 17))
            gray[cstart : cstart + clen] = rng.integers(CONTENT_LO, CONTENT_HI, size=min(clen, n - cstart))
        # watermark spans: 1-3 contiguous spans totalling ~wm_coverage
        total_wm = max(cfg.min_span, int(n * wm_coverage))
        n_spans = int(rng.integers(1, 4))
        span_len = max(cfg.min_span, total_wm // n_spans)
        for _ in range(n_spans):
            sstart = int(rng.integers(0, max(1, n - span_len)))
            gray[sstart : sstart + span_len] = wm
        # lift some tokens out of [0,256) to exercise the mod projection
        lift = rng.integers(0, 2, size=n).astype(np.int32) * 256
        tokens = gray + lift

        if plant_motifs and gi % motif_every == 0:
            cat = MOTIF_CATEGORIES[gi % len(MOTIF_CATEGORIES)]
            code = MOTIF_CATEGORIES.index(cat)
            payload = rng.integers(0, 100, size=4).astype(np.int32)
            motif = np.array(list(MOTIF_PREFIX) + [400 + code, 4], dtype=np.int32)
            motif = np.concatenate([motif, payload])
            mstart = int(rng.integers(0, max(1, n - motif.size)))
            tokens = np.concatenate([tokens[:mstart], motif, tokens[mstart:]])
            n = tokens.size

        ids.append(f"src{s_idx:02d}-doc{gi:010d}")
        toks.append(tokens)
        ntoks.append(n)
        srcs.append(source)
        tss.append(ts)

    return pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "tokens": pa.array([t.tolist() for t in toks], pa.list_(pa.int32())),
            "n_tok": pa.array(ntoks, pa.int32()),
            "source": pa.array(srcs, pa.string()),
            "event_ts": pa.array(tss, pa.int64()),
        }
    )


def hash_u32(x: int) -> int:
    """Deterministic 32-bit mix (splitmix-style); no Python ``hash`` (seeded)."""
    x = (x ^ (x >> 16)) * 0x45D9F3B & 0xFFFFFFFF
    x = (x ^ (x >> 16)) * 0x45D9F3B & 0xFFFFFFFF
    return (x ^ (x >> 16)) & 0xFFFFFFFF


def write_stream(path: str, n_rows: int, chunk: int = 20_000, **kw) -> str:
    """Write a synthetic stream to one Parquet file in bounded-memory chunks."""
    writer = None
    try:
        for start in range(0, n_rows, chunk):
            t = generate_stream(min(chunk, n_rows - start), start_row=start, **kw)
            if writer is None:
                writer = pq.ParquetWriter(path, t.schema)
            writer.write_table(t)
    finally:
        if writer is not None:
            writer.close()
    return path


# ---------------------------------------------------------------------------
# Documents-derived sequences (oracle-SQL-expressible tokenization)
# ---------------------------------------------------------------------------


def tokenize_texts(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Codepoint-tokenize a list of strings, vectorized.

    Returns (flat int32 codepoints, int32 lengths).  Equivalent DuckDB SQL:
    ``list_transform(regexp_extract_all(text, '.'), x -> unicode(x))``.
    """
    joined = "".join(texts)
    flat = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4").astype(np.int32)
    lens = np.array([len(t) for t in texts], dtype=np.int32)
    return flat, lens


def tokenize_documents_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id:int64, text, source, ...) -> SEQ_SCHEMA_TS batch.

    doc_id := lpad(doc_id, 12, '0'); tokens := codepoints(text);
    event_ts := original int doc_id.  Fully deterministic; DuckDB oracle in
    ``__ray_entry__.oracle_sql``.
    """
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    flat, lens = tokenize_texts(texts)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(flat, pa.int32()))
    return pa.table(
        {
            "doc_id": pa.array([f"{i:012d}" for i in ids], pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(lens, pa.int32()),
            "source": batch["source"],
            "event_ts": pa.array(ids.astype(np.int64), pa.int64()),
        }
    )
