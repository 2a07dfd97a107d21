"""Convert reference PyTorch checkpoints to this framework's parameter trees.

The reference saves split state dicts ``{encoder, decoder, joint, optimizer,
epoch, step}`` (reference: ``tt/utils.py:80-91``, written per epoch at
``train.py:249-250``).  This module maps those tensors onto the flax
parameter tree of :class:`models.transducer.Transducer`, enabling
CER-identical validation of trained reference models on TPU.

Torch is NOT required here: callers pass ``{name: np.ndarray}`` dicts
(e.g. ``{k: v.numpy() for k, v in torch.load(p)['encoder'].items()}``).

Layout notes:
* torch ``nn.Linear.weight`` is (out, in) — flax kernels are (in, out), so
  every weight is transposed;
* the fused QKV projection keeps its column order (q, k, v) under transpose;
* per-layer position tables (``r_emb``/``r_w_bias``/``r_bias``) copy as-is;
* the shared FFN LayerNorm (one torch module used twice) maps to the single
  flax ``ff/ln``.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _layer_params(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    g = lambda name: np.asarray(sd[prefix + name])
    return {
        "r_emb": g("r_emb"),
        "r_w_bias": g("r_w_bias"),
        "r_bias": g("r_bias"),
        "attn": {
            "qkv": {"kernel": g("MultiHeadAttention.dec_attn.qkv_net.weight").T},
            "out": {"kernel": g("MultiHeadAttention.dec_attn.o_net.weight").T},
            "ln": {"scale": g("MultiHeadAttention.dec_attn.layer_norm.weight"),
                   "bias": g("MultiHeadAttention.dec_attn.layer_norm.bias")},
        },
        "ff": {
            "ln": {"scale": g("MultiHeadAttention.pos_ff.layer_norm.weight"),
                   "bias": g("MultiHeadAttention.pos_ff.layer_norm.bias")},
            "fc1": {"kernel": g("MultiHeadAttention.pos_ff.CoreNet.0.weight").T,
                    "bias": g("MultiHeadAttention.pos_ff.CoreNet.0.bias")},
            "fc2": {"kernel": g("MultiHeadAttention.pos_ff.CoreNet.3.weight").T,
                    "bias": g("MultiHeadAttention.pos_ff.CoreNet.3.bias")},
        },
    }


def encoder_params(sd: Mapping[str, np.ndarray]) -> Dict:
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("layers."))
    return {f"layer_{i}": _layer_params(sd, f"layers.{i}.") for i in range(n_layers)}


def decoder_params(sd: Mapping[str, np.ndarray]) -> Dict:
    out = encoder_params({k: v for k, v in sd.items() if k.startswith("layers.")})
    out["embedding"] = {"embedding": np.asarray(sd["dec_embedding.weight"])}
    return out


def joint_params(sd: Mapping[str, np.ndarray]) -> Dict:
    return {
        "forward_layer": {"kernel": np.asarray(sd["forward_layer.weight"]).T,
                          "bias": np.asarray(sd["forward_layer.bias"])},
        "project_layer": {"kernel": np.asarray(sd["project_layer.weight"]).T,
                          "bias": np.asarray(sd["project_layer.bias"])},
    }


def transducer_params(encoder_sd, decoder_sd, joint_sd) -> Dict:
    """Full flax variable dict for :class:`Transducer` from the three split
    state dicts of a reference checkpoint."""
    return {"params": {
        "encoder": encoder_params(encoder_sd),
        "decoder": decoder_params(decoder_sd),
        "joint": joint_params(joint_sd),
    }}


def load_reference_checkpoint(path: str) -> Dict:
    """Load a reference ``.chkpt`` file (requires torch) into flax params."""
    import torch  # local import: torch is optional at runtime
    ck = torch.load(path, map_location="cpu", weights_only=False)
    to_np = lambda sd: {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return transducer_params(to_np(ck["encoder"]), to_np(ck["decoder"]),
                             to_np(ck["joint"]))
