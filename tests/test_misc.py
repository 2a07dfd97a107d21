import numpy as np

import jax.numpy as jnp

from transformer_transducer_tpu.ops.misc import label_smoothing, save_spectrogram_image


def test_label_smoothing():
    x = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    out = np.asarray(label_smoothing(x, epsilon=0.1))
    np.testing.assert_allclose(out, [[0.925, 0.025, 0.025, 0.025]], rtol=1e-6)
    np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-6)


def test_spectrogram_image(tmp_path):
    spec = np.random.RandomState(0).randn(50, 16)
    path = str(tmp_path / "spec.png")
    save_spectrogram_image(spec, path)
    import os
    assert os.path.getsize(path) > 1000
