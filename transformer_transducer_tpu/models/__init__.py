from transformer_transducer_tpu.models.transducer import (  # noqa: F401
    Transducer, AudioEncoder, LabelEncoder, JointNetwork, build_transducer,
)
