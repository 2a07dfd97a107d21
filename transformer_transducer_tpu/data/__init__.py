from transformer_transducer_tpu.data.dataset import AudioDataset  # noqa: F401
from transformer_transducer_tpu.data.loader import DataLoader  # noqa: F401
