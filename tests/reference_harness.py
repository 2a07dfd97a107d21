"""Import harness for the read-only PyTorch reference at /root/reference.

Used ONLY by parity tests: we instantiate the reference model, convert its
weights with ``utils.torch_convert`` and assert our TPU-native forward matches
numerically.  ``librosa``/``editdistance``/``pyaudio`` are not installed in
this image, so minimal stub modules are injected before importing ``tt``.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference_tt():
    """Returns the reference ``tt`` package (model/encoder/decoder/transformer)."""
    _stub("librosa", feature=types.SimpleNamespace(melspectrogram=None))
    _stub("editdistance", eval=lambda a, b: 0)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import tt.model  # noqa: F401
    import tt.utils  # noqa: F401
    return sys.modules["tt"]


class RefConfig(dict):
    """AttrDict-alike for building reference modules in tests."""

    def __getattr__(self, item):
        if item not in self:
            return None
        v = self[item]
        if type(v) is dict:
            v = RefConfig(v)
            self[item] = v
        return v


def tiny_model_config(vocab=11, d_model=8, n_head=2, d_head=4, d_inner=16,
                      enc_layers=2, dec_layers=1, joint_inner=12,
                      max_in=16, max_tgt=6):
    return RefConfig({
        "enc": {"max_input_length": max_in, "n_head": n_head, "d_model": d_model,
                "d_head": d_head, "d_inner": d_inner, "n_layer": enc_layers},
        "dec": {"max_target_length": max_tgt, "n_head": n_head, "d_model": d_model,
                "d_head": d_head, "d_inner": d_inner, "n_layer": dec_layers},
        "joint": {"input_size": 2 * d_model, "inner_size": joint_inner},
        "vocab_size": vocab,
        "dropout": 0.0,
    })
