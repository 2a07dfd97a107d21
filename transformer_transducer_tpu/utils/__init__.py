from transformer_transducer_tpu.utils.config import Config, load_config  # noqa: F401
from transformer_transducer_tpu.utils.vocab import Vocabulary  # noqa: F401
from transformer_transducer_tpu.utils.metrics import levenshtein, batch_cer  # noqa: F401
from transformer_transducer_tpu.utils.logging import init_logger  # noqa: F401
