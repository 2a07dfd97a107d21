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


# ---------------------------------------------------------------------------
# ESPnet-variant family (tt_espnet/model.py)
# ---------------------------------------------------------------------------

def espnet_subsampling_params(sd: Mapping[str, np.ndarray],
                              prefix: str = "embed.") -> Dict:
    """``Conv2dSubsampling{,6,8}`` state dict -> flax params for
    ``models.espnet_variant.Conv2dSubsampling``: torch conv (O, I, KH, KW)
    -> flax (KH, KW, I, O); the trailing Linear flattens channel-major on
    both sides (torch ``view(b, t, c*f)`` == our transpose+reshape)."""
    g = lambda name: np.asarray(sd[prefix + name])
    idxs = sorted({int(k[len(prefix) + 5:].split(".")[0]) for k in sd
                   if k.startswith(prefix + "conv.") and k.endswith(".weight")})
    sub: Dict = {}
    for ci, ti in enumerate(idxs):
        sub[f"conv_{ci}"] = {
            "kernel": g(f"conv.{ti}.weight").transpose(2, 3, 1, 0),
            "bias": g(f"conv.{ti}.bias")}
    sub["out"] = {"kernel": g("out.0.weight").T, "bias": g("out.0.bias")}
    return sub


def espnet_encoder_params(sd: Mapping[str, np.ndarray]) -> Dict:
    """ESPnet ``TransformerEncoder`` state dict -> flax params for
    ``models.espnet_variant.EspnetTransformerEncoder``."""
    g = lambda name: np.asarray(sd[name])
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("encoders."))
    out: Dict = {}
    for i in range(n_layers):
        p = f"encoders.{i}."
        out[f"layer_{i}"] = {
            "self_attn": {
                "linear_q": {"kernel": g(p + "self_attn.linear_q.weight").T,
                             "bias": g(p + "self_attn.linear_q.bias")},
                "linear_k": {"kernel": g(p + "self_attn.linear_k.weight").T,
                             "bias": g(p + "self_attn.linear_k.bias")},
                "linear_v": {"kernel": g(p + "self_attn.linear_v.weight").T,
                             "bias": g(p + "self_attn.linear_v.bias")},
                "linear_out": {"kernel": g(p + "self_attn.linear_out.weight").T,
                               "bias": g(p + "self_attn.linear_out.bias")},
                "linear_pos": {"kernel": g(p + "self_attn.linear_pos.weight").T},
                "pos_bias_u": g(p + "self_attn.pos_bias_u"),
                "pos_bias_v": g(p + "self_attn.pos_bias_v"),
            },
            "feed_forward": {
                "w_1": {"kernel": g(p + "feed_forward.w_1.weight").T,
                        "bias": g(p + "feed_forward.w_1.bias")},
                "w_2": {"kernel": g(p + "feed_forward.w_2.weight").T,
                        "bias": g(p + "feed_forward.w_2.bias")},
            },
            "norm1": {"scale": g(p + "norm1.weight"), "bias": g(p + "norm1.bias")},
            "norm2": {"scale": g(p + "norm2.weight"), "bias": g(p + "norm2.bias")},
        }
    out["after_norm"] = {"scale": g("after_norm.weight"),
                         "bias": g("after_norm.bias")}
    if "embed.conv.0.weight" in sd:
        out["subsample"] = espnet_subsampling_params(sd)
    elif "embed.0.weight" in sd and sd["embed.0.weight"].ndim == 2 \
            and "embed.0.bias" not in sd:
        out["embed"] = {"embedding": g("embed.0.weight")}
    elif "embed.0.weight" in sd:
        out["input_proj"] = {"kernel": g("embed.0.weight").T,
                             "bias": g("embed.0.bias")}
        out["input_norm"] = {"scale": g("embed.1.weight"),
                             "bias": g("embed.1.bias")}
    return out


def espnet_joint_params(sd: Mapping[str, np.ndarray]) -> Dict:
    return {
        "lin_enc": {"kernel": np.asarray(sd["lin_enc.weight"]).T,
                    "bias": np.asarray(sd["lin_enc.bias"])},
        "lin_dec": {"kernel": np.asarray(sd["lin_dec.weight"]).T},
        "lin_out": {"kernel": np.asarray(sd["lin_out.weight"]).T,
                    "bias": np.asarray(sd["lin_out.bias"])},
    }


def espnet_transducer_params(encoder_sd, decoder_sd, joint_sd) -> Dict:
    return {"params": {
        "encoder": espnet_encoder_params(encoder_sd),
        "decoder": espnet_encoder_params(decoder_sd),
        "joint": espnet_joint_params(joint_sd),
    }}


def load_reference_checkpoint(path: str) -> Dict:
    """Load a reference ``.chkpt`` file (requires torch) into flax params."""
    import torch  # local import: torch is optional at runtime
    ck = torch.load(path, map_location="cpu", weights_only=False)
    to_np = lambda sd: {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return transducer_params(to_np(ck["encoder"]), to_np(ck["decoder"]),
                             to_np(ck["joint"]))
