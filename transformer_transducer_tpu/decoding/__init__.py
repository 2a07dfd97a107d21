from transformer_transducer_tpu.decoding import greedy  # noqa: F401
