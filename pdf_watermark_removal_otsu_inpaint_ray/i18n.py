"""Internationalization for the CLI's human-facing messages — the T6 analog
of the reference's ``i18n.py`` (``i18n.py:6-95`` LOCALES catalog,
``i18n.py:96-163`` Translator / set_language / get_translator / t):
same semantics — catalog keyed by message id, system-locale detection with
``en_US`` fallback, unknown keys echo the key, ``str.format`` kwargs with
graceful fallback on bad format args.  The language can be forced with the
``PDFWM_RAY_LANG`` environment variable (the engine's batch jobs have no
interactive locale negotiation).

Only the CLI's summary/error lines are translated; the JSON result line on
stdout stays machine-stable and untranslated.
"""

from __future__ import annotations

import locale
import os

LOCALES: dict[str, dict[str, str]] = {
    "zh_CN": {
        "title": "令牌水印移除引擎",
        "completed": "水印移除完成!",
        "output_saved": "输出已保存: {path}",
        "resume_notice": "续传模式: {parts} 个分区已提交, 将被跳过 (用 --overwrite 重算)",
        "rows_processed": "处理的行数: {rows}",
        "late_rows": "迟到行数: {late}",
        "partitions_committed": "已提交分区: {parts}",
        "error": "错误: {err}",
        "streaming_mode": "流式模式（增量引擎）",
        "batch_mode": "批处理模式（两阶段旗舰管道）",
    },
    "en_US": {
        "title": "Token Watermark Removal Engine",
        "completed": "Watermark removal completed successfully!",
        "output_saved": "Output saved to: {path}",
        "resume_notice": "resume: {parts} partition(s) already committed will be SKIPPED (pass --overwrite to recompute)",
        "rows_processed": "Rows processed: {rows}",
        "late_rows": "Late rows: {late}",
        "partitions_committed": "Partitions committed: {parts}",
        "error": "Error: {err}",
        "streaming_mode": "Streaming mode (incremental engine)",
        "batch_mode": "Batch mode (two-phase flagship pipeline)",
    },
}


def get_system_locale() -> str:
    """Detect the language: env override first, then system locale
    (``i18n.py`` uses ``locale.getdefaultlocale``; batch jobs prefer env)."""
    env = os.environ.get("PDFWM_RAY_LANG")
    if env:
        return env
    try:
        loc = locale.getlocale()[0] or ""
    except ValueError:
        loc = ""
    return "zh_CN" if loc.startswith("zh") else "en_US"


class Translator:
    def __init__(self, language: str | None = None):
        if language is None:
            language = get_system_locale()
        self.language = language if language in LOCALES else "en_US"
        self.messages = LOCALES[self.language]

    def t(self, key: str, **kwargs) -> str:
        message = self.messages.get(key, key)
        if kwargs:
            try:
                return message.format(**kwargs)
            except Exception:
                return message
        return message


_translator: Translator | None = None


def set_language(language: str) -> None:
    global _translator
    _translator = Translator(language)


def get_translator() -> Translator:
    global _translator
    if _translator is None:
        _translator = Translator()
    return _translator


def t(key: str, **kwargs) -> str:
    return get_translator().t(key, **kwargs)
