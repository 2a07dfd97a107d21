from transformer_transducer_tpu.streaming.session import StreamingSession  # noqa: F401
