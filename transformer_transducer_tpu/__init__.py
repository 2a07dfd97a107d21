"""transformer_transducer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) streaming-ASR
framework with the capabilities of zzpDapeng/Transformer-Transducer.

The reference implementation is PyTorch + an external CUDA RNN-T loss
(see /root/reference). This framework is a ground-up TPU-first redesign:

* compute path: JAX + XLA, Pallas kernels for the RNN-T lattice and banded
  streaming attention;
* parallelism: ``jax.sharding.Mesh`` + jit shardings (data-parallel batch axis,
  tensor-parallel head/FFN axes kept open) instead of ``torch.nn.DataParallel``;
* runtime: a small C++ native library (``csrc/``) for the CPU-side hot paths
  (edit distance, WAV decode) with pure-Python fallbacks.

Import as ``import transformer_transducer_tpu as ttx``.
"""

__version__ = "0.1.0"

from transformer_transducer_tpu.utils.config import Config, load_config  # noqa: F401
