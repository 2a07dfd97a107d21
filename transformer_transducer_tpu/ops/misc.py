"""Small training/visualization utilities from the reference's toolbox."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def label_smoothing(inputs: jnp.ndarray, epsilon: float = 0.1) -> jnp.ndarray:
    """Smooth a one-hot/probability tensor over its last axis
    (reference ``tt/utils.py:292-294``)."""
    k = inputs.shape[-1]
    return (1.0 - epsilon) * inputs + epsilon / k


def save_spectrogram_image(spectrogram: np.ndarray, path: str) -> None:
    """Render a (T, F) feature matrix to an image file (headless twin of the
    reference's ``tensor_to_img`` plot window, ``tt/utils.py:332-336``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.imshow(np.asarray(spectrogram).T, origin="lower", aspect="auto")
    ax.set_xlabel("frames")
    ax.set_ylabel("bins")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
