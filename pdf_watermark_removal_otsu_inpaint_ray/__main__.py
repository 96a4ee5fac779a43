"""``python -m pdf_watermark_removal_otsu_inpaint_ray`` — the CLI entry the package
docstrings advertise (engine analog of the reference console script,
pyproject.toml:53-54)."""

from .cli import main

raise SystemExit(main())
