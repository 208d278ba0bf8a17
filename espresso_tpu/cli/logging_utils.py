"""Shared CLI logging setup.

Replaces per-CLI ``logging.basicConfig(force=True)``: orbax/absl install a
root StreamHandler at import that must go (it duplicates every line), but
``force=True`` also removes pytest's caplog capture handler, silently
breaking log-assertion tests (the reference CLIs configure logging once in
fairseq_cli/train.py:52-58 without clobbering foreign handlers).
"""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(asctime)s | %(levelname)s | %(name)s | %(message)s"


def setup_logging(level: int = logging.INFO, stream=None) -> None:
    """Install the CLI stdout handler, removing import-time interlopers
    (orbax/absl) but keeping test-harness handlers (pytest caplog)."""
    root = logging.getLogger()
    for h in list(root.handlers):
        if "pytest" not in type(h).__module__:
            root.removeHandler(h)
    handler = logging.StreamHandler(stream if stream is not None else sys.stdout)
    handler.setFormatter(logging.Formatter(_FORMAT))
    root.addHandler(handler)
    root.setLevel(level)
