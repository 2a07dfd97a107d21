"""Sequence-parallel banded encoding (parallel/sequence.py).

Validates the shard_map + ppermute halo exchange on the virtual 8-device
CPU mesh: oracle equality, shard-count invariance, and interior equality
with the standard dense path at the pinned window length.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_transducer_tpu.models.transducer import Transducer
from transformer_transducer_tpu.ops.masks import context_mask
from transformer_transducer_tpu.parallel.sequence import (
    encode_banded_sp, encode_banded_sp_oracle, pinned_window_len, seq_mesh)

LEFT, RIGHT = 4, 2
T = 32
W = 64  # pinned window (shared across shard counts for the invariance test)


@pytest.fixture(scope="module")
def setup():
    model = Transducer(vocab_size=11, enc=(2, 64, 2, 16, 8, 32),
                       dec=(1, 6, 2, 16, 8, 32), joint_inner=12, dropout=0.0)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, T, 16))
    variables = model.init(rng, x[:, :8], jnp.zeros((2, 4), jnp.int32))
    return model, variables, x


def test_sp_matches_oracle(setup):
    model, variables, x = setup
    mesh = seq_mesh(4)
    got = np.asarray(encode_banded_sp(model, variables, x, mesh, LEFT, RIGHT,
                                      window_len=W))
    ref = np.asarray(encode_banded_sp_oracle(model, variables, x, 4, LEFT,
                                             RIGHT, window_len=W))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # shard-count sweep; oracle test pins correctness
def test_sp_invariant_in_shard_count(setup):
    """With the window length pinned, the result must not depend on how
    many devices the time axis shards over (1, 2, 4, 8)."""
    model, variables, x = setup
    outs = []
    for n in (1, 2, 4, 8):
        mesh = seq_mesh(n)
        outs.append(np.asarray(encode_banded_sp(
            model, variables, x, mesh, LEFT, RIGHT, window_len=W)))
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # redundant angle on the oracle test
def test_sp_interior_matches_dense_path(setup):
    """Away from the right sequence boundary (where sp zeroes absent
    future frames every layer while a single padded window lets the pad
    rows evolve through the stack), sp must equal the standard dense
    banded encode at the same pinned length."""
    model, variables, x = setup
    mesh = seq_mesh(8)
    got = np.asarray(encode_banded_sp(model, variables, x, mesh, LEFT, RIGHT,
                                      window_len=W))
    padded = jnp.pad(x, ((0, 0), (0, W - T), (0, 0)))
    ref = np.asarray(model.apply(variables, padded,
                                 context_mask(W, LEFT, RIGHT),
                                 method=Transducer.encode))[:, :T]
    n_layer = model.enc[0]
    interior = T - n_layer * RIGHT
    np.testing.assert_allclose(got[:, :interior], ref[:, :interior],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # edge-band regression; oracle covers the core
def test_sp_left_zero(setup):
    """left=0 (pure look-ahead band) must still match the oracle — a
    ``h[:, -left:]`` slice would silently grab the WHOLE shard here
    (round-3 regression)."""
    model, variables, x = setup
    mesh = seq_mesh(4)
    got = np.asarray(encode_banded_sp(model, variables, x, mesh, 0, RIGHT,
                                      window_len=W))
    ref = np.asarray(encode_banded_sp_oracle(model, variables, x, 4, 0,
                                             RIGHT, window_len=W))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # edge-band regression; oracle covers the core
def test_sp_right_zero(setup):
    """right=0 (causal band) exchanges no right halo."""
    model, variables, x = setup
    mesh = seq_mesh(4)
    got = np.asarray(encode_banded_sp(model, variables, x, mesh, LEFT, 0,
                                      window_len=W))
    ref = np.asarray(encode_banded_sp_oracle(model, variables, x, 4, LEFT,
                                             0, window_len=W))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_seq_mesh_rejects_overask():
    """seq_mesh must raise, not silently truncate, when asked for more
    devices than exist — a silent 1-device mesh would skip the ppermute
    path and make shard-invariance tests vacuous."""
    with pytest.raises(ValueError, match="requested"):
        seq_mesh(len(jax.devices()) + 1)


def test_sp_rejects_undersized_shards(setup):
    model, variables, x = setup
    mesh = seq_mesh(8)  # shard of 4 == left is ok; left=5 is not
    with pytest.raises(ValueError, match="halo"):
        encode_banded_sp(model, variables, x, mesh, 5, RIGHT, window_len=W)
    with pytest.raises(ValueError, match="divide"):
        encode_banded_sp(model, variables, x[:, :30], mesh, LEFT, RIGHT,
                         window_len=W)


def test_pinned_window_len():
    assert pinned_window_len(10, 52, 2) == 64
    assert pinned_window_len(10, 53, 2) == 128
