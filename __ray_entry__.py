"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship pipeline (windowed watermark detection + token-span
  inpainting) over sf0.001-derived sequences; returns the rewritten stream.
- ``queries()``: one callable per implemented operator/pipeline from
  SURVEY.md §2 + the training-data ops (dedup / similarity / text analysis /
  retrieval / BPE tokenization / multimodal incl. image near-dup /
  streaming dedup, interval + temporal joins / CDC compaction / CEP).
- ``oracle_sql()``: exact DuckDB twins where SQL-expressible; the full
  inpaint chain and the probabilistic sketches are rows-only here and
  byte-verified against the golden NumPy oracle in pytest instead.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001."""
    from pdf_watermark_removal_otsu_inpaint_ray.config import DEFAULT_CONFIG
    from pdf_watermark_removal_otsu_inpaint_ray.pipelines.flagship import run_flagship
    from pdf_watermark_removal_otsu_inpaint_ray.sources import read_documents_as_sequences

    cfg = DEFAULT_CONFIG.with_(window_kind="tumbling", window_size=64)
    ds = read_documents_as_sequences("/root/testdata/sf0.001")
    return run_flagship(ds, cfg, batch_size=256)


def queries() -> dict[str, Callable[[str], Any]]:
    from pdf_watermark_removal_otsu_inpaint_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pdf_watermark_removal_otsu_inpaint_ray.queries import ORACLE_SQL

    # Pipelines with no closed-form SQL are checked against the materialized
    # single-process NumPy golden (pure pyarrow/numpy, no Ray) — make sure
    # those parquet files exist for the driver's correctness sf before the
    # SQL that reads them runs, regardless of query/oracle execution order.
    sql = dict(ORACLE_SQL)

    def _drop_missing_goldens() -> None:
        # REAL rows-only fallback: a golden that failed to materialize must
        # drop its SQL entry (driver degrades to a rows-only check) instead
        # of shipping SQL that reads a missing parquet and fails opaquely
        import os
        import sys

        from pdf_watermark_removal_otsu_inpaint_ray.oracle_data import (
            GOLDEN_QUERIES,
            golden_path,
        )

        for name in GOLDEN_QUERIES:
            if name in sql and not os.path.exists(golden_path(name)):
                print(f"[oracle] golden for {name!r} missing - rows-only check",
                      file=sys.stderr)
                sql.pop(name)

    try:
        from pdf_watermark_removal_otsu_inpaint_ray.oracle_data import (
            ORACLE_SF_DEFAULT,
            ensure_golden,
        )

        import os

        if os.path.isdir(ORACLE_SF_DEFAULT):
            ensure_golden(ORACLE_SF_DEFAULT)
        _drop_missing_goldens()
    except Exception as err:
        import sys

        print(f"[oracle] golden materialization failed: {err!r} - "
              "golden-backed queries fall back to rows-only", file=sys.stderr)
        try:
            _drop_missing_goldens()
        except Exception:
            pass
    return sql
