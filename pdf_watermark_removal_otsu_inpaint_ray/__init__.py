"""Ray-Data-native structured-streaming / CEP engine over tokenized sequences.

Recasts the watermark-removal pipeline of the reference repo
(``Tinnci/pdf-watermark-removal-otsu-inpaint``) — Otsu-style dominant-value
detection + mask inpainting over page images — as a stateful dataflow over
Parquet streams of pre-tokenized training sequences
``(doc_id:string, tokens:list<int32>, n_tok:int32, source:string)``.

See SURVEY.md §0 for the image-space → token-space Rosetta stone. Correctness
is defined by :mod:`.golden` — a deterministic single-process NumPy oracle —
and the distributed pipelines in :mod:`.pipelines` must match it byte-for-byte
on the ``tokens`` column.
"""

from .config import EngineConfig, DEFAULT_CONFIG
from .schema import SEQ_SCHEMA

__all__ = ["EngineConfig", "DEFAULT_CONFIG", "SEQ_SCHEMA"]
__version__ = "0.1.0"
