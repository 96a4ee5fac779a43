from .flagship import detect_watermarks, run_flagship

__all__ = ["detect_watermarks", "run_flagship"]
