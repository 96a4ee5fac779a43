"""Text-analysis stages for large-scale training-data pipelines.

Each is a ``map_batches`` body; the stateful ones (compiled regexes, stopword
tables) are callable classes — the actor-pool pattern (setup once per actor in
``__init__``, reference analog yolo_detector.py:57-146).

Every scalar definition here has an exact DuckDB twin in
``__ray_entry__.oracle_sql`` (word = ``\\S+`` run; codepoint tokens; 1-based
positional fingerprint) so the driver can value-check them.
"""

from __future__ import annotations

from ..config import scaled_parts

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is")
PUNCT_RE = r"[.,!?;:]"
WORD_RE = r"\S+"
# Python twin of RE2's ASCII \S ([^\t\n\f\r ]): Python's re is
# Unicode-aware, so a bare \S+ would treat NBSP etc. as non-space and
# disagree with the Arrow/DuckDB word counts on Unicode whitespace
# (n_stop > n_words, lang_id diverging from its RE2 oracle twin)
PY_WORD_RE = r"[^\t\n\f\r ]+"
FP_MOD = 1_000_003
FP_MULT = 2_654_435_761  # Knuth multiplicative constant


class TextStats:
    """doc → token/quality counters (all integers, oracle-checkable)."""

    def __init__(self):
        self.word = re.compile(PY_WORD_RE)
        self.stop = set(STOPWORDS_EN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_words = pc.count_substring_regex(batch["text"], WORD_RE).cast(pa.int64())
        n_punct = pc.count_substring_regex(batch["text"], PUNCT_RE).cast(pa.int64())
        n_stop = pa.array(
            [sum(w in self.stop for w in self.word.findall(t.lower())) for t in texts],
            pa.int64(),
        )
        n_chars = pc.utf8_length(batch["text"]).cast(pa.int64())
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_chars": n_chars,
                "n_words": n_words,
                "n_punct": n_punct,
                "n_stop": n_stop,
            }
        )


class LangId:
    """Stopword-vote language ID.  The oracle-checked rule is the simple
    binary one (any EN stopword → 'en'); :meth:`scores` gives the richer
    multi-language vote for library use."""

    SETS = {
        "en": STOPWORDS_EN,
        "de": ("der", "die", "und", "das", "ist", "zu"),
        "fr": ("le", "la", "et", "les", "des", "est"),
        "es": ("el", "la", "de", "que", "los", "es"),
    }

    def __init__(self):
        self.word = re.compile(PY_WORD_RE)
        self.sets = {k: set(v) for k, v in self.SETS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        en = self.sets["en"]
        pred = [
            "en" if any(w in en for w in self.word.findall(t.lower())) else "und"
            for t in texts
        ]
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "lang_pred": pa.array(pred, pa.string()),
            }
        )

    def scores(self, text: str) -> dict[str, int]:
        words = self.word.findall(text.lower())
        return {k: sum(w in s for w in words) for k, s in self.sets.items()}


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Positional document fingerprint over codepoint tokens.

    fp = sum_i cp[i] * ((i * FP_MULT) % FP_MOD) % FP_MOD, i 1-based —
    exactly ``list_sum(list_transform(cps, (x,i) -> x * ((i*2654435761) %
    1000003) % 1000003))`` in DuckDB (index lambdas are 1-based).
    """
    from ..stages.kernels import flatten_list_column
    from ..synth import tokenize_texts

    texts = batch["text"].to_pylist()
    flat, lens = tokenize_texts(texts)
    pos = np.concatenate([np.arange(1, n + 1) for n in lens]) if len(texts) else np.zeros(0, np.int64)
    w = (pos.astype(np.int64) * FP_MULT) % FP_MOD
    term = (flat.astype(np.int64) * w) % FP_MOD
    off = np.concatenate([[0], np.cumsum(lens)])
    fp = np.zeros(len(texts), np.int64)
    if len(texts) and flat.size:
        # reduceat only over NON-EMPTY docs' starts: clipping starts would
        # steal the preceding doc's final token whenever the batch ends
        # with empty texts (same boundary class as hash_partition_ids)
        nz = np.asarray(lens) > 0
        fp[nz] = np.add.reduceat(term, off[:-1][nz])
    return pa.table(
        {
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "fingerprint": pa.array(fp.astype(np.int64), pa.int64()),
        }
    )


def normalize_text_batch(batch: pa.Table) -> pa.Table:
    """Canonical text normalization (the pre-dedup cleanup of a crawl
    pipeline): Unicode NFC → lowercase → collapse whitespace runs to one
    space → trim — ``trim(regexp_replace(lower(nfc_normalize(text)),
    '\\s+', ' ', 'g'))`` in DuckDB, exactly (lower/regex/trim are Arrow
    C++ kernels; Arrow and DuckDB both use RE2 so the \\s class agrees).

    The NFC step uses ``unicodedata.normalize`` (C per string, one Python
    call per DOC — not per char): this build's ``pc.utf8_normalize``
    decomposes but never RE-COMPOSES (verified codepoint-level:
    NFC('e'+U+0301) stays decomposed), so it can never match DuckDB's
    nfc_normalize.  NFC (not NFKC) because DuckDB only exposes NFC."""
    import unicodedata

    t = pa.array(
        [
            None if s is None else unicodedata.normalize("NFC", s)
            for s in batch["text"].to_pylist()
        ],
        pa.string(),
    )
    t = pc.utf8_lower(t)
    t = pc.replace_substring_regex(t, pattern="\\s+", replacement=" ")
    t = pc.utf8_trim_whitespace(t)
    return pa.table(
        {
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "norm_text": t,
        }
    )


_WS_SPLIT_RE = "[\\t\\n\\f\\r ]+"  # ASCII-space complement of WORD_RE


def _words_with_rows(text_col):
    """Lowercased ``\\S+`` tokens with their row ids, dictionary-encoded.

    Fully vectorized: one ``utf8_lower`` + one ``split_pattern_regex`` +
    one ``dictionary_encode`` per batch — no per-row Python.  Returns
    ``(rows, codes, vocab)`` where ``vocab[codes[i]]`` is the i-th token
    and ``rows[i]`` its batch-local row.  Empty tokens produced by
    leading/trailing whitespace (and by empty docs) are dropped, so the
    token multiset equals DuckDB's ``regexp_extract_all(lower(text),
    '\\S+')``."""
    low = pc.utf8_lower(text_col)
    if isinstance(low, pa.ChunkedArray):
        low = low.combine_chunks()
    lists = pc.split_pattern_regex(low, pattern=_WS_SPLIT_RE)
    counts = np.asarray(pc.list_value_length(lists).fill_null(0), np.int64)
    rows = np.repeat(np.arange(len(lists), dtype=np.int64), counts)
    flat = lists.flatten()
    d = flat.dictionary_encode()
    codes = np.asarray(d.indices, np.int64)
    keep = np.asarray(pc.not_equal(flat, ""))
    return rows[keep], codes[keep], d.dictionary


def term_df_partials(batch: pa.Table) -> pa.Table:
    """Per-batch document-frequency PARTIALS: (term, df) where df counts
    the batch's docs containing the term.  Docs are row-atomic (one row =
    one doc, never split across batches), so summing partials per term in
    a downstream ``groupby("term").sum("df")`` is the exact corpus df —
    the combiner-before-shuffle shape: the shuffle carries one row per
    (batch, distinct term), never token-scale data."""
    rows, codes, vocab = _words_with_rows(batch["text"])
    if rows.size == 0:
        return pa.table(
            {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
        )
    nv = len(vocab)
    upair = np.unique(rows * nv + codes)
    df = np.bincount(upair % nv, minlength=nv)
    present = np.nonzero(df)[0]
    return pa.table(
        {
            "term": vocab.take(pa.array(present, pa.int64())).cast(pa.string()),
            "df": pa.array(df[present], pa.int64()),
        }
    )


class DocTopTerm:
    """Per-doc top term by (tf DESC, corpus df ASC, term ASC) — the
    integer-exact ranking twin of tf·idf (most frequent in the doc, rarest
    in the corpus): no float idf, so the DuckDB twin hash-matches bit-for-
    bit.  Actor-pool stage: the corpus (term → df) map is ``ray.put`` once
    and fetched zero-copy per actor in ``__init__``; each batch resolves
    tokens with one vectorized searchsorted + lexsort.

    Scale note (100 TB): the broadcast vocab must be capped — pass the df
    table through a ``df >= min_df`` / top-V filter before ``ray.put`` and
    route the (rare) docs whose every term fell below the cap to a shuffle
    join; at web scale the head vocabulary decides the top term for almost
    every document."""

    def __init__(self, vocab_ref):
        import ray

        v = ray.get(vocab_ref)  # zero-copy view per worker process
        self.terms = v["terms"]  # object-dtype, sorted (codepoint order)
        self.df = v["df"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows, codes, vocab = _words_with_rows(batch["text"])
        ids = np.asarray(batch["doc_id"].cast(pa.int64()))
        if rows.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                }
            )
        nv = len(vocab)
        upair, tf = np.unique(rows * nv + codes, return_counts=True)
        r, c = upair // nv, upair % nv
        terms = np.asarray(vocab, dtype=object)[c]
        df = self.df[np.searchsorted(self.terms, terms)]
        order = np.lexsort((terms, df, -tf, r))
        first = np.unique(r[order], return_index=True)[1]
        sel = order[first]
        return pa.table(
            {
                "doc_id": pa.array(ids[r[sel]], pa.int64()),
                "term": pa.array(terms[sel].tolist(), pa.string()),
                "tf": pa.array(tf[sel], pa.int64()),
                "df": pa.array(df[sel], pa.int64()),
            }
        )


def doc_top_terms_capped(docs_ds, *, min_df: int = 2, num_parts: int | None = None):
    """Per-doc top term by (tf DESC, corpus df ASC, term ASC) with a
    CAPPED broadcast — the 100-TB execution of :class:`DocTopTerm`'s
    scale note, exact by construction (same output, different plan; the
    driver checks it against the same SQL twin as ``doc_top_terms``):

    1. the corpus df table folds distributed (vocab-safe keyed fold) and
       stays a DATASET; only the ``df >= min_df`` HEAD collects and
       broadcasts (``ray.put``) — the broadcast is bounded by the cap,
       not by vocabulary size;
    2. a candidate scan emits each doc's max-tf terms.  A doc resolves
       LOCALLY iff every candidate is in the head (the ranking prefers
       LOW df, so an absent candidate — df < min_df — would beat every
       head term at equal tf: such docs cannot resolve against the capped
       broadcast and become RESIDUE);
    3. residue candidate rows attach their df by a coarse term-hash
       repartition join against the distributed df table (the house
       union + map_groups join — no row leaves with an unresolved df),
       then one doc-hash partition picks each residue doc's winner.

    Local winners ∪ residue winners = exactly the uncapped output
    (pinned by pytest at several min_df/partition layouts).  Residue
    volume is the docs whose max-tf tie-set touches sub-cap vocabulary —
    at web scale the tail-term mass a curation pipeline already trims.
    """
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    import ray

    from ..sinks.exactly_once import hash_partition_ids
    from .dedup import _collect_arrow
    from .vocabfold import keyed_fold

    df_ds = keyed_fold(
        docs_ds.select_columns(["text"]).map_batches(
            term_df_partials, batch_format="pyarrow"
        ),
        key="term",
        sums=("df",),
        num_parts=num_parts,
    ).materialize()  # vocab-scale rows; reused by the head collect AND the residue join

    def head_filter(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["df"], min_df))

    head_tbl = _collect_arrow(
        df_ds.map_batches(head_filter, batch_format="pyarrow"),
        pa.schema([("term", pa.string()), ("df", pa.int64())]),
    )
    h_terms = np.asarray(head_tbl["term"].to_pylist(), dtype=object)
    h_order = np.argsort(h_terms)
    h_terms = h_terms[h_order]
    h_df = np.asarray(head_tbl["df"], np.int64)[h_order]
    href = ray.put((h_terms, h_df))

    _EMPTY = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
        }
    )

    def candidates(batch: pa.Table) -> pa.Table:
        ht, hd = ray.get(href)
        rows, codes, vocab = _words_with_rows(batch["text"])
        ids = np.asarray(batch["doc_id"].cast(pa.int64()))
        if rows.size == 0:
            return _EMPTY
        nv = len(vocab)
        upair, tf = np.unique(rows * nv + codes, return_counts=True)
        r, c = upair // nv, upair % nv
        starts = np.concatenate(([True], r[1:] != r[:-1]))
        run_id = np.cumsum(starts) - 1
        run_starts = np.nonzero(starts)[0]
        maxtf = np.maximum.reduceat(tf, run_starts)
        cand = tf == maxtf[run_id]
        rc, cc, tfc, ridc = r[cand], c[cand], tf[cand], run_id[cand]
        terms_c = np.asarray(vocab, dtype=object)[cc]
        if ht.size:
            pos = np.minimum(np.searchsorted(ht, terms_c), ht.size - 1)
            known = ht[pos] == terms_c
            dfc = np.where(known, hd[pos], np.int64(-1))
        else:
            known = np.zeros(terms_c.size, bool)
            dfc = np.full(terms_c.size, -1, np.int64)
        n_runs = run_starts.size
        unk_run = np.bincount(ridc, weights=~known, minlength=n_runs) > 0
        need = unk_run[ridc]
        # local winners: per fully-known run, min (df, term)
        loc = ~need
        out_doc = []
        out_term = []
        out_tf = []
        out_df = []
        if loc.any():
            order = np.lexsort((terms_c[loc], dfc[loc], ridc[loc]))
            rl = ridc[loc][order]
            first = np.concatenate(([True], rl[1:] != rl[:-1]))
            sel = order[first]
            out_doc.append(ids[rc[loc][sel]])
            out_term.append(terms_c[loc][sel])
            out_tf.append(tfc[loc][sel])
            out_df.append(dfc[loc][sel])
        if need.any():
            out_doc.append(ids[rc[need]])
            out_term.append(terms_c[need])
            out_tf.append(tfc[need])
            out_df.append(np.full(int(need.sum()), -1, np.int64))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
                "term": pa.array(
                    np.concatenate(out_term).tolist(), pa.string()
                ),
                "tf": pa.array(np.concatenate(out_tf), pa.int64()),
                "df": pa.array(np.concatenate(out_df), pa.int64()),
            }
        )

    # candidate rows are doc-scale (a doc's max-tf tie set); materialize so
    # the done/residue split does not recompute the scan
    cand_ds = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        candidates, batch_format="pyarrow"
    ).materialize()

    def keep_done(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["df"], 0))

    def keep_residue(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(b["df"], 0))

    done = cand_ds.map_batches(keep_done, batch_format="pyarrow")

    def tag_res(b: pa.Table) -> pa.Table:
        b = keep_residue(b)
        tpk = hash_partition_ids(b["term"].combine_chunks(), num_parts)
        return b.append_column("tpk", pa.array(tpk, pa.int64()))

    def tag_df(b: pa.Table) -> pa.Table:
        tpk = hash_partition_ids(b["term"].combine_chunks(), num_parts)
        return pa.table(
            {
                "doc_id": pa.array(np.full(len(b), -1, np.int64), pa.int64()),
                "term": b["term"],
                "tf": pa.array(np.full(len(b), -1, np.int64), pa.int64()),
                "df": b["df"].cast(pa.int64()),
                "tpk": pa.array(tpk, pa.int64()),
            }
        )

    def attach_df(g: "pd.DataFrame") -> "pd.DataFrame":
        side_df = g[g["doc_id"].to_numpy() < 0]
        res = g[g["doc_id"].to_numpy() >= 0]
        if len(res) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype=np.int64),
                    "term": pd.Series(dtype=object),
                    "tf": pd.Series(dtype=np.int64),
                    "df": pd.Series(dtype=np.int64),
                }
            )
        out = res[["doc_id", "term", "tf"]].merge(
            side_df[["term", "df"]], on="term", how="inner"
        )
        return out.astype(
            {"doc_id": np.int64, "tf": np.int64, "df": np.int64}
        )

    def add_dpk(b: pa.Table) -> pa.Table:
        d = np.asarray(b["doc_id"], np.int64).astype(np.uint64)
        dpk = (
            ((d * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
            % np.uint64(num_parts)
        ).astype(np.int64)
        return b.append_column("dpk", pa.array(dpk, pa.int64()))

    def pick_best(g: "pd.DataFrame") -> "pd.DataFrame":
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype=np.int64),
                    "term": pd.Series(dtype=object),
                    "tf": pd.Series(dtype=np.int64),
                    "df": pd.Series(dtype=np.int64),
                }
            )
        doc = g["doc_id"].to_numpy().astype(np.int64)
        term = g["term"].to_numpy(dtype=object)
        df_ = g["df"].to_numpy().astype(np.int64)
        tf_ = g["tf"].to_numpy().astype(np.int64)
        order = np.lexsort((term, df_, doc))
        dd = doc[order]
        first = np.concatenate(([True], dd[1:] != dd[:-1]))
        sel = order[first]
        return pd.DataFrame(
            {
                "doc_id": doc[sel],
                "term": term[sel],
                "tf": tf_[sel],
                "df": df_[sel],
            }
        )

    resolved = (
        cand_ds.map_batches(tag_res, batch_format="pyarrow")
        .union(df_ds.map_batches(tag_df, batch_format="pyarrow"))
        .groupby("tpk")
        .map_groups(attach_df, batch_format="pandas")
        .map_batches(add_dpk, batch_format="pyarrow")
        .groupby("dpk")
        .map_groups(pick_best, batch_format="pandas")
    )

    def strip(b: pa.Table) -> pa.Table:
        return b.select(["doc_id", "term", "tf", "df"])

    return done.map_batches(strip, batch_format="pyarrow").union(
        resolved.map_batches(strip, batch_format="pyarrow")
    )


def chunk_documents_batch(
    batch: pa.Table, *, window: int = 256, stride: int = 192
) -> pa.Table:
    """Split each document into fixed-width codepoint windows with overlap —
    the context-window packing prep of a training pipeline (stride < window
    ⇒ overlapping chunks).  Emits (doc_id, chunk_id, n_chars, chunk); docs
    with empty text emit zero chunks.

    Vectorized per chunk RANK, not per row: all docs long enough to own a
    k-th chunk are sliced together with one scalar-offset
    ``utf8_slice_codeunits`` call (Arrow has no per-row-offset slice
    kernel); ranks are bounded by the longest doc in the batch, so the loop
    is O(max_len/stride) kernel calls regardless of row count.  Exact
    DuckDB twin: ``substr(text, k*stride + 1, window)`` over a
    ``generate_series`` rank join (codepoint semantics on both sides).
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    lens = np.asarray(pc.utf8_length(batch["text"]), np.int64)
    ids = np.asarray(batch["doc_id"].cast(pa.int64()))
    n_chunks = np.where(lens == 0, 0, (np.maximum(lens - 1, 0) // stride) + 1)
    max_rank = int(n_chunks.max()) if n_chunks.size else 0
    parts = []
    text = batch["text"].combine_chunks()
    for k in range(max_rank):
        sel = np.nonzero(n_chunks > k)[0]
        sliced = pc.utf8_slice_codeunits(
            text.take(pa.array(sel, pa.int64())), k * stride, k * stride + window
        )
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(ids[sel], pa.int64()),
                    "chunk_id": pa.array(np.full(sel.size, k, np.int64), pa.int64()),
                    "n_chars": pc.utf8_length(sliced).cast(pa.int64()),
                    "chunk": sliced,
                }
            )
        )
    if not parts:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
                "chunk": pa.array([], pa.string()),
            }
        )
    return pa.concat_tables(parts)


def _gram_scan(text_col, n: int):
    """ONE tokenize + gram pass shared by every gram consumer (the gram
    definition must live in exactly one place — decontaminate, dup-span
    stats and redaction silently diverge otherwise).

    Returns ``(word_rows, flat_words, gram_rows, grams, gram_pos)``: the
    batch-local row id of every (non-empty, lowered ``\\S+``) word, the
    flat word StringArray, and per full-n-gram occurrence its row id,
    joined string, and the flat-word index of its FIRST word.
    """
    low = pc.utf8_lower(text_col)
    if isinstance(low, pa.ChunkedArray):
        low = low.combine_chunks()
    lists = pc.split_pattern_regex(low, pattern=_WS_SPLIT_RE)
    counts = np.asarray(pc.list_value_length(lists).fill_null(0), np.int64)
    rows_all = np.repeat(np.arange(len(lists), dtype=np.int64), counts)
    flat = lists.flatten()
    keep = np.asarray(pc.not_equal(flat, ""))
    flat = flat.filter(pa.array(keep))  # order-preserving
    rows = rows_all[keep]
    total = len(flat)
    if total < n:
        return rows, flat, np.empty(0, np.int64), pa.array([], pa.string()), np.empty(0, np.int64)
    m = total - n + 1
    # position i starts an n-gram iff its n-th word is still the same row
    ok = rows[:m] == rows[n - 1 : n - 1 + m]
    parts = [flat.slice(j, m) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    pos = np.arange(m, dtype=np.int64)[ok]
    return rows, flat, rows[:m][ok], grams.filter(pa.array(ok)), pos


def _grams_with_rows(text_col, n: int):
    """Word *n*-gram strings with their batch-local row ids, vectorized.

    Tokens are the same lowercased ``\\S+`` runs as ``_words_with_rows``
    (exact DuckDB twin: ``regexp_extract_all(lower(text), '\\S+')``); the
    i-th n-gram of a row is its words i..i+n-1 joined by a single space —
    the twin of ``ws[i] || ' ' || ws[i+1] || ...`` over a 1-based
    ``range(1, len(ws) - n + 2)`` rank join.  One split + n slices + one
    ``binary_join_element_wise`` per batch; no per-row Python.

    Returns ``(rows, grams)``: int64 row ids and a string Array, one entry
    per n-gram position (duplicates kept — callers that need set semantics
    dedupe downstream).
    """
    _, _, gram_rows, grams, _ = _gram_scan(text_col, n)
    return gram_rows, grams


class DecontaminateStage:
    """Benchmark decontamination: flag corpus docs sharing any word n-gram
    with a held-out eval set (the GPT-3/PaLM 13-gram rule at a test-scale
    n).  The eval gram set is the SMALL side: distinct grams are broadcast
    ONCE via ``ray.put`` and resolved per actor in ``__init__`` — corpus
    docs stream through ``pc.is_in`` (exact string membership, one C++
    hash-set probe per gram position); no shuffle, no join.  Reference
    analog: the protect-list semantics of text_protector.py (a small
    blocklist applied to a big stream), re-expressed corpus-scale."""

    def __init__(self, gram_ref, n: int = 3):
        import ray

        self.grams = ray.get(gram_ref)  # pa.StringArray of distinct grams
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        nr = batch.num_rows
        rows, grams = _grams_with_rows(batch["text"], self.n)
        n_grams = (
            np.bincount(rows, minlength=nr) if rows.size else np.zeros(nr, np.int64)
        )
        if rows.size and len(self.grams):
            hit = np.asarray(pc.is_in(grams, value_set=self.grams))
            n_hits = np.bincount(rows[hit], minlength=nr)
        else:
            n_hits = np.zeros(nr, np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_grams": pa.array(n_grams.astype(np.int64), pa.int64()),
                "n_hits": pa.array(n_hits.astype(np.int64), pa.int64()),
                "is_contam": pa.array((n_hits > 0).astype(np.int64), pa.int64()),
            }
        )


def eval_gram_array(eval_ds, n: int = 3) -> pa.Array:
    """Distinct word n-grams of the (small) eval side, computed distributed
    (per-batch distinct partials) and deduped once on the driver — eval
    sets are benchmark-scale, so the collected array is broadcast-sized by
    construction."""

    def distinct_batch(b: pa.Table) -> pa.Table:
        _, grams = _grams_with_rows(b["text"], n)
        return pa.table({"g": grams.unique()})

    parts = eval_ds.map_batches(distinct_batch, batch_format="pyarrow").to_pandas()
    # an eval set with NO full gram (all docs shorter than n words) yields
    # only empty blocks, whose to_pandas has no columns — that's an empty
    # blocklist, not an error
    vals = parts["g"].tolist() if "g" in parts.columns else []
    return pa.array(sorted(set(vals)), pa.string())


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style per-doc repetition counters (MassiveText quality rules,
    integer-exact so the DuckDB twin hash-matches): words, bigram count,
    count of the most frequent bigram, duplicate-trigram count, and the
    repetition flag ``5 * top_bigram_cnt >= n_bigrams`` (top bigram owns
    >= 20% of all bigram positions).  One dictionary-encode + bincount per
    gram order; no per-row Python."""
    nr = batch.num_rows
    n_words = pc.count_substring_regex(batch["text"], WORD_RE).cast(pa.int64())

    r2, g2 = _grams_with_rows(batch["text"], 2)
    n_bigrams = np.bincount(r2, minlength=nr) if r2.size else np.zeros(nr, np.int64)
    top = np.zeros(nr, np.int64)
    if r2.size:
        d2 = g2.dictionary_encode()
        codes = np.asarray(d2.indices, np.int64)
        pair = r2 * len(d2.dictionary) + codes
        upair, cnt = np.unique(pair, return_counts=True)
        np.maximum.at(top, upair // len(d2.dictionary), cnt)

    r3, g3 = _grams_with_rows(batch["text"], 3)
    dup_tri = np.zeros(nr, np.int64)
    if r3.size:
        d3 = g3.dictionary_encode()
        c3 = np.asarray(d3.indices, np.int64)
        p3 = r3 * len(d3.dictionary) + c3
        n_tri = np.bincount(r3, minlength=nr)
        n_tri_distinct = np.bincount(np.unique(p3) // len(d3.dictionary), minlength=nr)
        dup_tri = (n_tri - n_tri_distinct).astype(np.int64)

    is_rep = ((n_bigrams > 0) & (top * 5 >= n_bigrams)).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_words": n_words,
            "n_bigrams": pa.array(n_bigrams.astype(np.int64), pa.int64()),
            "top_bigram_cnt": pa.array(top, pa.int64()),
            "dup_trigram_cnt": pa.array(dup_tri, pa.int64()),
            "is_repetitive": pa.array(is_rep, pa.int64()),
        }
    )


class RedactGramsStage:
    """Contamination REDACTION — the rewrite twin of :class:`Decontaminate
    Stage`: instead of flagging documents that share a word n-gram with the
    held-out eval set, rewrite them, masking every word that participates
    in any matching gram occurrence (the scrubbing shape of a PII /
    benchmark-leak removal pass; reference analog: the inpaint rewrite
    itself — detect spans, replace their tokens — applied to words).

    Output text is whitespace-normalized lowercase (single spaces), the
    same canonical form the gram definitions use, so the DuckDB
    ``array_to_string(list(CASE ...))`` twin is exact.  Fully vectorized:
    one split, n-1 shifted joins, one ``pc.is_in``, three shifted OR
    masks, one ``pc.if_else`` + list rebuild — no per-row Python.
    """

    def __init__(self, gram_ref, n: int = 3, mask_token: str = "<wm>"):
        import ray

        self.grams = ray.get(gram_ref)
        self.n = n
        self.mask_token = mask_token

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.n
        n_rows = batch.num_rows
        rows, flat, _, grams, gram_pos = _gram_scan(batch["text"], n)
        bad = np.zeros(len(flat), bool)
        if len(grams) and len(self.grams):
            hit = np.asarray(pc.is_in(grams, value_set=self.grams))
            pos = gram_pos[hit]
            for d in range(n):
                bad[pos + d] = True
        masked = pc.if_else(
            pa.array(bad), pa.scalar(self.mask_token, pa.string()), flat
        )
        word_counts = np.bincount(rows, minlength=n_rows).astype(np.int64)
        off = np.concatenate(([0], np.cumsum(word_counts))).astype(np.int32)
        relist = pa.ListArray.from_arrays(pa.array(off, pa.int32()), masked)
        text_out = pc.binary_join(relist, pa.scalar(" ", pa.string()))
        n_red = (
            np.bincount(rows[bad], minlength=n_rows).astype(np.int64)
            if bad.any()
            else np.zeros(n_rows, np.int64)
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "redacted": text_out,
                "n_redacted": pa.array(n_red, pa.int64()),
            }
        )


def collapse_repeat_words_batch(batch: pa.Table) -> pa.Table:
    """Intra-document repetition scrub: drop every word equal to its
    immediate predecessor ("a a a b" → "a b") — the consecutive-duplicate
    cleaner complementing the Gopher repetition COUNTERS
    (repetition_stats_batch measures; this one rewrites).

    Output text is whitespace-normalized lowercase, same canonical form as
    RedactGramsStage.  Fully vectorized: the shared ``_gram_scan``
    tokenizer, one shifted Arrow ``equal`` per batch, one list rebuild.
    Returns (doc_id, collapsed, n_dropped).
    """
    rows, flat, _, _, _ = _gram_scan(batch["text"], 1)
    n = batch.num_rows
    total = len(flat)
    dup = np.zeros(total, bool)
    if total > 1:
        same = np.asarray(
            pc.equal(flat.slice(0, total - 1), flat.slice(1, total - 1))
        )
        dup[1:] = same & (rows[1:] == rows[:-1])
    keep_idx = np.nonzero(~dup)[0]
    kept = flat.take(pa.array(keep_idx, pa.int64()))
    kept_rows = rows[keep_idx]
    word_counts = np.bincount(kept_rows, minlength=n).astype(np.int64)
    off = np.concatenate(([0], np.cumsum(word_counts))).astype(np.int32)
    relist = pa.ListArray.from_arrays(pa.array(off, pa.int32()), kept)
    text_out = pc.binary_join(relist, pa.scalar(" ", pa.string()))
    dropped = (
        np.bincount(rows[dup], minlength=n).astype(np.int64)
        if dup.any()
        else np.zeros(n, np.int64)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "collapsed": text_out,
            "n_dropped": pa.array(dropped, pa.int64()),
        }
    )


def term_cooccurrence(ds, *, vocab_size: int = 64):
    """Head-vocabulary term co-occurrence counts (the GloVe/PMI-style
    co-occurrence matrix builder): for the ``vocab_size`` highest-df terms,
    count the DOCUMENTS containing each unordered term pair — two streaming
    passes, never a pair-explosion shuffle.

    1. **Vocabulary pass**: :func:`term_df_partials` -> ``groupby(term)
       .sum(df)``; the driver picks the top-V terms by (df DESC, term ASC
       in UTF-8 byte order — DuckDB's binary collation).  Vocab-scale
       driver traffic only.
    2. **GEMM pass**: each batch builds its docs x V 0/1 indicator matrix
       (distinct (doc, term-in-vocab) pairs) and emits the nonzero upper
       triangle of the V x V Gram matrix ``A.T @ A`` — a fixed <= V(V-1)/2
       key space per batch regardless of corpus size — summed by one tiny
       ``groupby((i, j)).sum``.

    Returns a pa.Table ``(t1, t2, cnt)`` with ``t1 < t2`` (byte order) and
    ``cnt`` = number of docs containing both.  Pairs never co-occurring are
    absent (matches the SQL self-join twin).  At 100 TB the only scale knob
    is V (the Gram partial is V^2 int64 per block); the document axis
    streams.
    """
    import pandas as pd

    from .vocabfold import keyed_fold_topv

    # top-V by (df DESC, term ASC in utf-8 BYTE order == DuckDB ORDER BY
    # term) — per-partition fold + trim, driver traffic <= V x num_parts
    # rows regardless of vocabulary cardinality
    ranked = keyed_fold_topv(
        ds.map_batches(term_df_partials, batch_format="pyarrow"),
        key="term",
        sum_col="df",
        v=vocab_size,
    )
    vocab = sorted((t for t, _ in ranked), key=lambda t: t.encode())
    v_index = {t: i for i, t in enumerate(vocab)}
    V = len(vocab)

    def gram_partials(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if V == 0 or len(b) == 0:
            return empty
        rows, codes, bvocab = _words_with_rows(b["text"])
        # batch-dict terms -> global vocab index: vocab-scale loop (distinct
        # terms in the batch), never token-scale
        lookup = np.array(
            [v_index.get(t, -1) for t in bvocab.to_pylist()], np.int64
        )
        gidx = lookup[codes]
        keep = gidx >= 0
        rows, gidx = rows[keep], gidx[keep]
        if rows.size == 0:
            return empty
        r_u, r_inv = np.unique(rows, return_inverse=True)
        upair = np.unique(r_inv * V + gidx)  # distinct (doc, term) presence
        A = np.zeros((r_u.size, V), np.int64)
        A[upair // V, upair % V] = 1
        C = A.T @ A
        iu, ju = np.triu_indices(V, k=1)
        cnt = C[iu, ju]
        nz = cnt > 0
        return pa.table(
            {
                "i": pa.array(iu[nz].astype(np.int64), pa.int64()),
                "j": pa.array(ju[nz].astype(np.int64), pa.int64()),
                "cnt": pa.array(cnt[nz], pa.int64()),
            }
        )

    sums = (
        ds.map_batches(gram_partials, batch_format="pyarrow")
        .groupby(["i", "j"])
        .sum("cnt")
        .to_pandas()  # <= V(V-1)/2 rows — fixed key space
    )
    varr = np.array(vocab, dtype=object)
    order = np.lexsort(
        (sums["j"].to_numpy(), sums["i"].to_numpy())
    ) if len(sums) else np.array([], np.int64)
    return pa.table(
        {
            "t1": pa.array(varr[sums["i"].to_numpy()[order]], pa.string())
            if len(sums)
            else pa.array([], pa.string()),
            "t2": pa.array(varr[sums["j"].to_numpy()[order]], pa.string())
            if len(sums)
            else pa.array([], pa.string()),
            "cnt": pa.array(
                sums["sum(cnt)"].to_numpy()[order].astype(np.int64), pa.int64()
            )
            if len(sums)
            else pa.array([], pa.int64()),
        }
    )


# --- content-defined chunking (FastCDC/Gear-style, §2.7 storage dedup) -----

_CDC_GOLD = np.uint64(0x9E3779B97F4A7C15)
_CDC_POLY = np.uint64(0x100000001B3)  # FNV-64 prime, chunk-hash base
_CDC_WIN = 64  # effective gear window: contributions shift out after 64 bytes


def _gear_table() -> np.ndarray:
    """256-entry uint64 gear table: splitmix64((v + 1) * golden-gamma) —
    the public-PRNG spec constant shared with the pure-Python oracle twin
    (same independence level as the minhash seed derivation)."""
    from .dedup import _mix64

    v = np.arange(256, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return _mix64((v + np.uint64(1)) * _CDC_GOLD)


_GEAR = _gear_table()


def cdc_chunks_batch(
    b: pa.Table,
    *,
    avg_bits: int = 6,
    min_len: int = 16,
    max_len: int = 192,
) -> pa.Table:
    """Content-defined chunking over the utf-8 BYTES of ``text`` — the
    storage-dedup primitive (a shifted/partially-edited re-crawl keeps
    identical chunk hashes outside the edit, which fixed-stride
    ``chunk_documents_batch`` cannot): gear rolling hash ``h_i =
    Σ_{t<64} gear[b_{i-t}] << t`` (mod 2^64, window never crossing the
    doc start), a CUT after byte ``i`` when the chunk is >= min_len and
    ``h_i & (2^avg_bits - 1) == 0`` (expected chunk ~2^avg_bits bytes),
    a FORCED cut at max_len, and the remainder as the final chunk.  Cut
    candidates at the doc's last byte are moot (the chunk ends there
    regardless).  Emits (doc_id, chunk_idx, start, length, chunk_hash);
    chunk_hash = mix64(FNV-polynomial(bytes) ^ length).

    Fully vectorized: the batch's texts concatenate into ONE byte array;
    the gear hash is 64 shifted-gather adds with a doc-boundary mask; the
    min/max greedy resolves ALL docs simultaneously in rounds of one
    ``searchsorted`` each (rounds = max chunks per doc); chunk hashes are
    one power-table gather + ``np.add.reduceat``.  Stateless map_batches
    body — no shuffle; the chunk table is the input to a downstream
    exact-dedup groupby on chunk_hash.

    Reference analog: M8's span segmentation (watermark_remover.py
    component splitting) driven by content instead of mask geometry."""
    from .dedup import _mix64, _pow_table_64

    n_docs = b.num_rows
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int64()),
            "start": pa.array([], pa.int64()),
            "length": pa.array([], pa.int64()),
            "chunk_hash": pa.array([], pa.int64()),
        }
    )
    if n_docs == 0:
        return empty
    txt = b["text"].combine_chunks()
    ids = np.asarray(b["doc_id"], np.int64)
    # zero-copy utf-8 bytes straight from the Arrow buffers (offsets are
    # int32 for string, int64 for large_string) — no Python-level encode
    odt = np.int64 if pa.types.is_large_string(txt.type) else np.int32
    offs = np.frombuffer(txt.buffers()[1], odt)[
        txt.offset : txt.offset + len(txt) + 1
    ].astype(np.int64)
    data = np.frombuffer(txt.buffers()[2], np.uint8)
    flat = data[offs[0] : offs[-1]]
    all_lens = np.diff(offs)
    keep = all_lens > 0
    ids, lens = ids[keep], all_lens[keep]
    if lens.size == 0:
        return empty
    n = flat.size
    starts = np.concatenate(([0], np.cumsum(lens)))  # doc byte offsets
    doc_of = np.repeat(np.arange(lens.size), lens)
    doc_start = starts[doc_of]
    pos = np.arange(n, dtype=np.int64)
    # gear rolling hash, windowed at the doc start
    g = _GEAR[flat]
    h = np.zeros(n, np.uint64)
    with np.errstate(over="ignore"):
        for t in range(_CDC_WIN):
            if t >= n:
                break
            contrib = g[: n - t] << np.uint64(t)
            valid = (pos[t:] - t) >= doc_start[t:]
            h[t:] += np.where(valid, contrib, np.uint64(0))
    mask = np.uint64((1 << avg_bits) - 1)
    is_cand = (h & mask) == np.uint64(0)
    # a cut at the doc's final byte is moot — the chunk ends there anyway
    is_cand &= pos < (doc_start + lens[doc_of] - 1)
    cand = pos[is_cand]  # globally sorted absolute positions

    # simultaneous greedy over all docs: per round, each active doc takes
    # the first candidate in [cur+min_len-1, cur+max_len-1], else a forced
    # max_len cut, else its final chunk
    d_idx = np.arange(lens.size)
    cur = starts[:-1].copy()
    ends = starts[1:]
    cidx = np.zeros(lens.size, np.int64)
    out_doc: list[np.ndarray] = []
    out_ci: list[np.ndarray] = []
    out_st: list[np.ndarray] = []
    out_ln: list[np.ndarray] = []
    while d_idx.size:
        lo = cur + min_len - 1
        hi = np.minimum(cur + max_len - 1, ends[d_idx] - 2)
        ci = np.searchsorted(cand, lo)
        c = np.where(ci < cand.size, cand[np.minimum(ci, cand.size - 1)], 1 << 62)
        has = c <= hi
        forced = (~has) & (ends[d_idx] - cur > max_len)
        cut_end = np.where(has, c, cur + max_len - 1)  # inclusive cut byte
        done = (~has) & (~forced)
        emit = has | forced
        if emit.any():
            st = cur[emit]
            en = cut_end[emit] + 1
            out_doc.append(d_idx[emit])
            out_ci.append(cidx[d_idx[emit]])
            out_st.append(st)
            out_ln.append(en - st)
            cidx[d_idx[emit]] += 1
        if done.any():
            st = cur[done]
            en = ends[d_idx[done]]
            out_doc.append(d_idx[done])
            out_ci.append(cidx[d_idx[done]])
            out_st.append(st)
            out_ln.append(en - st)
        cur = np.where(emit, cut_end + 1, cur)[emit]
        d_idx = d_idx[emit]
    doc_i = np.concatenate(out_doc)
    ci_arr = np.concatenate(out_ci)
    st_arr = np.concatenate(out_st)  # absolute byte offsets
    ln_arr = np.concatenate(out_ln)
    # chunk hashes: FNV polynomial over each chunk's bytes via one power
    # gather + reduceat on the (chunk-sorted) flat byte array
    order = np.argsort(st_arr, kind="stable")  # segments in flat order
    doc_i, ci_arr, st_arr, ln_arr = (
        doc_i[order], ci_arr[order], st_arr[order], ln_arr[order]
    )
    maxlen = int(ln_arr.max())
    powt = _pow_table_64(_CDC_POLY, maxlen, f"cdc{maxlen}")
    seg_of = np.repeat(np.arange(st_arr.size), ln_arr)
    seg_end = (st_arr + ln_arr)[seg_of]
    expo = seg_end - 1 - pos  # position's exponent inside its chunk
    with np.errstate(over="ignore"):
        term = flat.astype(np.uint64) * powt[expo]
    seg_starts = np.concatenate(([0], np.cumsum(ln_arr[:-1])))
    sums = np.add.reduceat(term, seg_starts) if term.size else term
    with np.errstate(over="ignore"):
        ch = _mix64(sums ^ ln_arr.astype(np.uint64))
    return pa.table(
        {
            "doc_id": pa.array(ids[doc_i], pa.int64()),
            "chunk_idx": pa.array(ci_arr, pa.int64()),
            "start": pa.array(st_arr - starts[doc_i], pa.int64()),
            "length": pa.array(ln_arr, pa.int64()),
            "chunk_hash": pa.array(
                (ch & np.uint64((1 << 63) - 1)).astype(np.int64), pa.int64()
            ),
        }
    )


def vocab_growth(ds, *, bucket_docs: int = 50, num_parts: int | None = None):
    """Per-source vocabulary-growth curve (the Heaps'-law corpus
    diagnostic): bucket each source's docs by ``doc_id // bucket_docs``
    and report how many NEW distinct words first appear in each bucket,
    plus the running vocabulary size — the saturation curve a curation
    pipeline watches to detect template/boilerplate collapse.

    Distribution: per-batch distinct ``(source, word_hash, min doc_id)``
    partials (one lexsort per batch), one coarse ``groupby(hash(source,
    word))`` resolving the global first-occurrence doc per word, then a
    tiny ``(source, bucket)`` count; the cumulative sum runs over the
    sources × buckets result (output-scale).  Word identity is the
    63-bit hash (same caveat + precedent as ``dupspans``: the SQL twin
    groups by the word STRING; a collision would merge two words — odds
    ~1e-9 at this vocabulary).

    Returns (source, bucket, vocab_new, vocab_cum) int64/string rows.
    """
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    from .dedup import _word_hashes_flat

    def partials(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        wh, doc_off = _word_hashes_flat(texts)
        ids = np.asarray(b["doc_id"], np.int64)
        src = b["source"].to_pylist()
        src_codes, src_uniq = pd.factorize(np.asarray(src, dtype=object))
        rows = np.repeat(np.arange(len(texts)), np.diff(doc_off))
        w = (wh >> np.uint64(1)).astype(np.int64)  # non-negative word id
        sc = src_codes[rows]
        d = ids[rows]
        order = np.lexsort((d, w, sc))
        sc, w, d = sc[order], w[order], d[order]
        first = np.concatenate(([True], (sc[1:] != sc[:-1]) | (w[1:] != w[:-1])))
        sc, w, d = sc[first], w[first], d[first]
        pk = (
            (w.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + sc.astype(np.uint64))
            >> np.uint64(33)
        ) % np.uint64(num_parts)
        return pa.table(
            {
                "source": pa.array(np.asarray(src_uniq, dtype=object)[sc]),
                "w": pa.array(w, pa.int64()),
                "first_doc": pa.array(d, pa.int64()),
                "pk": pa.array(pk.astype(np.int64), pa.int64()),
            }
        )

    def first_per_word(g: pd.DataFrame) -> pd.DataFrame:
        s = g["source"].to_numpy()
        w = g["w"].to_numpy().astype(np.int64)
        d = g["first_doc"].to_numpy().astype(np.int64)
        sc, _ = pd.factorize(s)
        order = np.lexsort((d, w, sc))
        sc_s, w_s, d_s = sc[order], w[order], d[order]
        first = np.concatenate(
            ([True], (sc_s[1:] != sc_s[:-1]) | (w_s[1:] != w_s[:-1]))
        )
        out = pd.DataFrame(
            {
                "source": s[order][first],
                "bucket": d_s[first] // bucket_docs,
            }
        )
        return (
            out.groupby(["source", "bucket"], sort=False)
            .size()
            .rename("vocab_new")
            .reset_index()
        )

    curve = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(first_per_word, batch_format="pandas")
        .to_pandas()
    )
    # output-scale final fold: sources x buckets rows
    agg = (
        curve.groupby(["source", "bucket"], sort=True)["vocab_new"]
        .sum()
        .reset_index()
    )
    agg["vocab_cum"] = agg.groupby("source")["vocab_new"].cumsum()
    return pa.table(
        {
            "source": pa.array(agg["source"].tolist()),
            "bucket": pa.array(agg["bucket"].to_numpy(np.int64), pa.int64()),
            "vocab_new": pa.array(agg["vocab_new"].to_numpy(np.int64), pa.int64()),
            "vocab_cum": pa.array(agg["vocab_cum"].to_numpy(np.int64), pa.int64()),
        }
    )
