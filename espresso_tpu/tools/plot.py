"""Attention plot rendering for --print-alignment.

Rebuild of espresso/tools/utils.py:240-264 ``plot_attention``: one image per
utterance (attention matrix heatmap titled with the hypothesis), written
next to the exact ``attn.npz`` matrices the recognize CLI already saves
(espresso/speech_recognize.py:265-314 writes them under
``<results>/attn_plots/<utt_id>.pdf``).
"""

from __future__ import annotations

import os

import numpy as np


def plot_attention(
    attention: np.ndarray, hypo_sent: str, utt_id: str, save_dir: str
) -> str:
    """Render one attention heatmap to ``<save_dir>/<utt_id>.pdf``.

    Returns the written path. Raises ImportError with the reference's
    guidance if matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - matplotlib is baked in
        raise ImportError(
            "plot_attention requires matplotlib; install it or unset "
            "--print-alignment"
        ) from e

    os.makedirs(save_dir, exist_ok=True)
    attn = np.asarray(attention, dtype=np.float32)
    plt.matshow(attn)
    plt.title(hypo_sent, fontsize=8)
    filename = os.path.join(save_dir, f"{utt_id}.pdf")
    plt.savefig(filename, bbox_inches="tight")
    plt.close()
    return filename
