"""Named-strategy registry — the engine's user-extension surface (§2.10).

Reference extension points: pluggable detectors chosen by a
``detection_method`` string (watermark_detector.py:72-126), pluggable QR
backends (qr_detector.py:150-169), presets (document_classifier.py:180-229),
alternate inpaint algorithms (docs/ARCHITECTURE.md:250-255).

Engine mapping: three registries of named callables.  A detector maps
``(values, wm_pos, fb, cfg, max_span_pos) -> bool mask``; an inpainter maps
``(values, flag, fb) -> values``; a preset maps ``cfg -> cfg``.  The fused
stage looks strategies up by the names in ``EngineConfig`` so user code can
register alternatives without touching engine internals.
"""

from __future__ import annotations

from typing import Callable

_DETECTORS: dict[str, Callable] = {}
_INPAINTERS: dict[str, Callable] = {}
_PRESETS: dict[str, Callable] = {}
_PAYLOAD_RULES: dict = {}  # name -> list[PayloadRule] | classifier object
_MOTIF_MATCHERS: dict[str, Callable] = {}


_ROW_LOCAL_DETECTORS: set[str] = set()


def register_detector(name: str, fn: Callable, *, row_local: bool = False) -> Callable:
    """``row_local=True`` declares the detector independent of the phase-1
    watermark table (it never reads ``wm_pos``) — pipelines then skip the
    histogram phase entirely for it, like the builtin "auto" mode."""
    _DETECTORS[name] = fn
    if row_local:
        _ROW_LOCAL_DETECTORS.add(name)
    else:
        _ROW_LOCAL_DETECTORS.discard(name)
    return fn


def detector_is_row_local(name: str) -> bool:
    return name in _ROW_LOCAL_DETECTORS


def register_inpainter(name: str, fn: Callable) -> Callable:
    _INPAINTERS[name] = fn
    return fn


def register_preset(name: str, fn: Callable) -> Callable:
    _PRESETS[name] = fn
    return fn


def get_detector(name: str) -> Callable:
    return _DETECTORS[name]


def get_inpainter(name: str) -> Callable:
    return _INPAINTERS[name]


def apply_preset(name: str, cfg):
    return _PRESETS[name](cfg)


def register_motif_matcher(name: str, fn: Callable) -> Callable:
    """Register a motif matcher backend ``(fb, pattern) -> flat start
    indices`` (reference analog: the opencv|pyzbar dual QR backend
    dispatch, qr_detector.py:150-169)."""
    _MOTIF_MATCHERS[name] = fn
    return fn


def get_motif_matcher(name: str) -> Callable:
    return _MOTIF_MATCHERS[name]


def register_payload_rules(name: str, rules):
    """Register a named payload classifier (motif analog of the reference's
    QR content-type heuristic table, qr_detector.py:38-121): either a
    ``list[PayloadRule]`` chain, or any object with a
    ``classify(fb, starts, lens, window)`` method (the built-in
    ``TwoStageClassifier`` is one)."""
    if not isinstance(rules, list) and not hasattr(rules, "classify"):
        raise TypeError(
            "payload rules must be a list[PayloadRule] or expose .classify(...)"
        )
    _PAYLOAD_RULES[name] = rules
    return rules


def get_payload_rules(name: str):
    """Return the registered rule chain (list) or classifier object."""
    return _PAYLOAD_RULES[name]


def _register_builtins() -> None:
    from .stages import kernels

    register_detector("color", kernels.detect_mask_flat)
    register_detector(
        "auto",
        lambda values, wm_pos, fb, cfg, max_span_pos=None: kernels.detect_mask_auto_flat(
            values, fb, cfg, max_span_pos
        ),
        row_local=True,
    )
    register_inpainter("nearest", kernels.inpaint_flat)

    # learned detector (T3): per-process cached heavy LUT, yolo-path analog;
    # row-local (never reads wm_pos), so pipelines skip the histogram phase
    from .functions.learned import learned_flag_detector

    register_detector("learned", learned_flag_detector, row_local=True)

    # presets mirroring get_optimal_parameters + the electronic-color preset
    # (document_classifier.py:180-229)
    def _electronic_color(cfg):
        return cfg.with_(tolerance=15, strength=1.0, kernel_size=2, protect_text=True, passes=1)

    from .stages.motif import (
        DEFAULT_PAYLOAD_RULES,
        find_pattern_flat,
        find_pattern_rolling,
    )

    register_payload_rules("default", DEFAULT_PAYLOAD_RULES)

    # QR-breadth two-stage classifier (qr_detector.py:309-351): 9-type
    # dispatch + keyword fallback, 10 output categories
    from .stages.motif import TwoStageClassifier

    register_payload_rules("qr", TwoStageClassifier())
    register_motif_matcher("exact", find_pattern_flat)
    register_motif_matcher("rolling-hash", find_pattern_rolling)

    register_preset("electronic-color", _electronic_color)
    for name in ("electronic", "scanned", "mixed"):
        def _mk(n):
            def f(cfg):
                from .functions.classifier import optimal_parameters

                return cfg.with_(**optimal_parameters(n))

            return f

        register_preset(name, _mk(name))


_register_builtins()
