"""The shipped configs build real models; param counts match the torch
reference at full size."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_transducer_tpu.utils.config import load_config
from transformer_transducer_tpu.models.transducer import build_transducer

CONFIGS = ["configs/aishell.yaml", "configs/joint_streaming.yaml",
           "configs/joint_non_streaming.yaml"]


def _count(params):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


@pytest.mark.parametrize("path", CONFIGS)
def test_config_builds_and_param_count_matches_torch(path):
    torch = pytest.importorskip("torch")
    from reference_harness import load_reference_tt

    cfg = load_config(path)
    model = build_transducer(cfg.model)
    d_in = cfg.data.feature_dim * (1 + cfg.data.left_context_width
                                   + cfg.data.right_context_width)
    assert d_in == cfg.model.enc.d_model  # no input projection (reference)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, d_in)),
                           jnp.zeros((1, 2), jnp.int32)))
    ours = {comp: _count(variables["params"][comp])
            for comp in ["encoder", "decoder", "joint"]}

    tt = load_reference_tt()
    ref_model = tt.model.Transducer(cfg.model)
    theirs = {
        "encoder": sum(p.numel() for p in ref_model.encoder.parameters()),
        "decoder": sum(p.numel() for p in ref_model.decoder.parameters()),
        "joint": sum(p.numel() for p in ref_model.joint.parameters()),
    }
    assert ours == theirs, f"{path}: {ours} != {theirs}"


def test_espnet_config_builds():
    cfg = load_config("configs/espnet_aishell.yaml")
    from transformer_transducer_tpu.models.espnet_variant import (
        build_espnet_transducer)
    model = build_espnet_transducer(cfg.model)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 512)),
                           jnp.asarray([8]), jnp.zeros((1, 4), jnp.int32),
                           jnp.asarray([4])))
    n = _count(shapes["params"])
    assert n > 10_000_000  # 8+2 layer 512-d model


def test_build_family_dispatches_on_schema():
    """models.factory picks the family from the espnet-schema marker
    (model.mask) and returns initializable variables for the CLI apps."""
    import jax.numpy as jnp
    from transformer_transducer_tpu.models.factory import build_family
    from transformer_transducer_tpu.utils.config import load_config

    cfg = load_config("configs/aishell.yaml")
    cfg.model.enc.n_layer = 1
    cfg.model.dec.n_layer = 1
    model, variables, is_espnet = build_family(cfg, 512)
    assert not is_espnet and "encoder" in variables["params"]

    ecfg = load_config("configs/espnet_aishell.yaml")
    ecfg.model.enc.num_blocks = 1
    ecfg.model.dec.num_blocks = 1
    emodel, evars, e_is = build_family(ecfg, 512)
    assert e_is and "joint" in evars["params"]
    # espnet encode signature: (speech, lengths)
    out = emodel.apply(evars, jnp.zeros((1, 8, 512)), jnp.asarray([8]),
                       method="encode")
    assert out.shape[0] == 1
