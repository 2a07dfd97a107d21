from transformer_transducer_tpu.training import optim  # noqa: F401
