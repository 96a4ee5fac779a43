"""S6 debug preview sink: spans/bands emitted per row match golden masks."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_watermark_removal_otsu_inpaint_ray import golden, synth
from pdf_watermark_removal_otsu_inpaint_ray.config import DEFAULT_CONFIG


def test_flag_preview_matches_golden(ray_session, tmp_path):
    import ray

    from pdf_watermark_removal_otsu_inpaint_ray.stages.debug import FlagPreviewStage, write_flag_preview
    from pdf_watermark_removal_otsu_inpaint_ray.sources import read_sequences
    from pdf_watermark_removal_otsu_inpaint_ray.stages.detect import compute_wm_table

    p = str(tmp_path / "s.parquet")
    synth.write_stream(p, 150, n_sources=2, n_tok_lo=48, n_tok_hi=128)
    cfg = DEFAULT_CONFIG.with_(window_kind="global")
    table = pq.read_table(p)
    wm = compute_wm_table(read_sequences(p), cfg)

    stage = FlagPreviewStage(wm, cfg)
    prev = stage(table)
    gwm = golden.golden_wm_table(table, cfg)
    for i in range(table.num_rows):
        toks = np.asarray(table["tokens"][i].as_py(), dtype=np.int32)
        src = table["source"][i].as_py()
        wm_tok = gwm.get((src, 0), (-1, 0.0))[0]
        mask = (
            golden.detect_mask(toks, wm_tok)
            if wm_tok >= 0
            else np.zeros(toks.size, dtype=bool)
        )
        assert prev["n_flagged"][i].as_py() == int(mask.sum())
        spans = list(zip(prev["span_starts"][i].as_py(), prev["span_lens"][i].as_py()))
        exp = [(s, e - s) for s, e in golden.runs(mask)]
        assert spans == exp, i

    out_dir = str(tmp_path / "dbg")
    write_flag_preview(read_sequences(p), wm, cfg, out_dir)
    back = pq.read_table(out_dir + "/" if False else out_dir)
    assert back.num_rows == 150
