"""Family-dispatching model construction for the CLI apps.

The two model families share the CLI surface (configs select the family:
an espnet-schema config carries a ``model.mask`` block, reference
``config/espnet_aishell.yaml`` vs ``config/joint_*.yaml``).  This is the one
place the apps decide which family a config means — the same marker
``streaming.StreamingConfig.from_config`` uses.
"""

from __future__ import annotations


def build_family(cfg, d_in: int):
    """(model, init_variables, is_espnet) from a full config.

    ``d_in``: stacked feature dimension (``feature_dim * (1 + left + right)``
    via ``utils.config.stack_context``); init shapes only — checkpoints
    restore over these variables.
    """
    import jax
    import jax.numpy as jnp

    if cfg.model.mask is not None:   # espnet-schema marker
        from transformer_transducer_tpu.models.espnet_variant import (
            build_espnet_transducer)
        model = build_espnet_transducer(cfg.model)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, d_in)),
            jnp.asarray([8]), jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]))
        return model, variables, True
    from transformer_transducer_tpu.models.transducer import build_transducer
    model = build_transducer(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, d_in)),
                           jnp.zeros((1, 4), jnp.int32))
    return model, variables, False
