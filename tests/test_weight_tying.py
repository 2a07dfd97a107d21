import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_transducer_tpu.models.transducer import Transducer


def test_shared_embedding_ties_projection():
    # tying requires joint_inner == d_model (the reference asserts the same)
    model = Transducer(vocab_size=12, enc=(1, 16, 2, 8, 4, 16),
                       dec=(1, 8, 2, 8, 4, 16), joint_inner=8,
                       share_embedding=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 8))
    y = jnp.asarray([[2, 5]], dtype=jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, y)
    params = variables["params"]
    # no independent projection kernel; a free bias exists
    assert "project_layer" not in params["joint"]
    assert "project_bias" in params["joint"]

    logits = model.apply(variables, x, y)
    assert logits.shape == (1, 4, 3, 12)

    # perturbing the embedding must change the output projection
    bumped = jax.tree_util.tree_map(lambda a: a, params)
    bumped["decoder"]["embedding"]["embedding"] = (
        params["decoder"]["embedding"]["embedding"] + 1.0)
    logits2 = model.apply({"params": bumped}, x, y)
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


def test_untied_by_default():
    model = Transducer(vocab_size=12, enc=(1, 16, 2, 8, 4, 16),
                       dec=(1, 8, 2, 8, 4, 16), joint_inner=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 8)),
                           jnp.zeros((1, 2), jnp.int32))
    assert "project_layer" in variables["params"]["joint"]
