"""Numerics parity vs the actual PyTorch reference implementation.

Builds the reference ``tt.model.Transducer`` on a tiny config, converts its
weights with ``utils.torch_convert`` and checks our forward pass reproduces
its outputs to float32 tolerance — encoder (with and without streaming band
mask), label encoder, joint and full (B,T,U+1,V) logits.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_harness import load_reference_tt, tiny_model_config
from transformer_transducer_tpu.models.transducer import Transducer
from transformer_transducer_tpu.ops.masks import context_mask
from transformer_transducer_tpu.utils import torch_convert as tc


@pytest.fixture(scope="module")
def pair():
    tt = load_reference_tt()
    cfg = tiny_model_config()
    torch.manual_seed(0)
    ref = tt.model.Transducer(cfg)
    ref.eval()

    model = Transducer(
        vocab_size=cfg.vocab_size,
        enc=(cfg.enc.n_layer, cfg.enc.max_input_length, cfg.enc.n_head,
             cfg.enc.d_model, cfg.enc.d_head, cfg.enc.d_inner),
        dec=(cfg.dec.n_layer, cfg.dec.max_target_length, cfg.dec.n_head,
             cfg.dec.d_model, cfg.dec.d_head, cfg.dec.d_inner),
        joint_inner=cfg.joint.inner_size, dropout=0.0)

    to_np = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
    variables = tc.transducer_params(to_np(ref.encoder), to_np(ref.decoder),
                                     to_np(ref.joint))
    variables = {"params": {k: _to_jnp(v) for k, v in variables["params"].items()}}
    return ref, model, variables, cfg


def _to_jnp(tree):
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)


def test_encoder_parity_unmasked(pair):
    ref, model, variables, cfg = pair
    x = np.random.RandomState(0).randn(2, 12, cfg.enc.d_model).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.encoder(torch.from_numpy(x), None).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x), None,
                                 method=Transducer.encode))
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-5)


def test_encoder_parity_streaming_mask(pair):
    ref, model, variables, cfg = pair
    tt = load_reference_tt()
    x = np.random.RandomState(1).randn(2, 12, cfg.enc.d_model).astype(np.float32)
    xt = torch.from_numpy(x)
    mask = tt.utils.context_mask(xt, left_context=3, right_context=1)[:, :, None]
    with torch.no_grad():
        ref_out = ref.encoder(xt, mask).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x),
                                 context_mask(12, 3, 1),
                                 method=Transducer.encode))
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-5)


def test_label_encoder_parity(pair):
    ref, model, variables, cfg = pair
    tokens = np.array([[0, 3, 5, 1], [0, 2, 2, 9]], dtype=np.int64)
    with torch.no_grad():
        ref_out = ref.decoder(torch.from_numpy(tokens)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(tokens), None,
                                 method=Transducer.predict))
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-5)


def test_full_forward_parity(pair):
    ref, model, variables, cfg = pair
    rng = np.random.RandomState(2)
    x = rng.randn(2, 9, cfg.enc.d_model).astype(np.float32)
    targets = rng.randint(1, cfg.vocab_size, size=(2, 4)).astype(np.int64)
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x), torch.from_numpy(targets)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(targets)))
    assert got.shape == ref_logits.shape == (2, 9, 5, cfg.vocab_size)
    np.testing.assert_allclose(got, ref_logits, rtol=2e-4, atol=2e-5)


def test_front_pad_rule_parity(pair):
    """Decoder k_len=6 but 7 tokens -> exercises the front-pad-repeat branch
    (reference tt/transformer.py:128-135), hit every step in real training."""
    ref, model, variables, cfg = pair
    tokens = np.array([[0, 3, 5, 1, 2, 4, 6]], dtype=np.int64)
    with torch.no_grad():
        ref_out = ref.decoder(torch.from_numpy(tokens)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(tokens), None,
                                 method=Transducer.predict))
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-5)
