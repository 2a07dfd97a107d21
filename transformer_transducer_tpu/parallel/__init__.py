from transformer_transducer_tpu.parallel import mesh  # noqa: F401
from transformer_transducer_tpu.parallel import pipeline  # noqa: F401
from transformer_transducer_tpu.parallel import sequence  # noqa: F401
from transformer_transducer_tpu.parallel import sharding  # noqa: F401
