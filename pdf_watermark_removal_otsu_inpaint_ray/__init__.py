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

def _tune_allocator() -> None:
    """Keep large NumPy/Arrow scratch buffers on the glibc heap.

    With glibc's default 128 KiB mmap threshold, every multi-MB batch
    allocation becomes mmap+munmap; at 32 concurrent workers the munmap TLB
    shootdowns serialize the node (measured 30x slowdowns in both the flat
    kernels and the sink's merge tasks).  Runs at package import — i.e. in
    every Ray worker that unpickles anything from this library.  No-op off
    glibc."""
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:
        pass


_tune_allocator()

from .config import EngineConfig, DEFAULT_CONFIG
from .schema import SEQ_SCHEMA

__all__ = ["EngineConfig", "DEFAULT_CONFIG", "SEQ_SCHEMA"]
__version__ = "0.1.0"
