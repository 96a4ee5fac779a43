"""Text-analysis stages for large-scale training-data pipelines.

Each is a ``map_batches`` body; the stateful ones (compiled regexes, stopword
tables) are callable classes — the actor-pool pattern (setup once per actor in
``__init__``, reference analog yolo_detector.py:57-146).

Every scalar definition here has an exact DuckDB twin in
``__ray_entry__.oracle_sql`` (word = ``\\S+`` run; codepoint tokens; 1-based
positional fingerprint) so the driver can value-check them.
"""

from __future__ import annotations

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
