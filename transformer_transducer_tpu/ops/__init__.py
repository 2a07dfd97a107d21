from transformer_transducer_tpu.ops import features  # noqa: F401
from transformer_transducer_tpu.ops import features_np  # noqa: F401
from transformer_transducer_tpu.ops import masks  # noqa: F401
from transformer_transducer_tpu.ops import rnnt_loss  # noqa: F401
