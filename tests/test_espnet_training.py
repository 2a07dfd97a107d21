"""End-to-end training/eval of the ESPnet-variant family via the Trainer."""

import numpy as np
import pytest

from data_helpers import make_corpus
from transformer_transducer_tpu.training.trainer import Trainer
from transformer_transducer_tpu.utils.config import Config


def espnet_tiny_config(root, vocab_path, csvs, vocab_size=12, d=16):
    return Config({
        "data": {
            "name": "synth", "vocab": vocab_path,
            "left_context_width": 3, "right_context_width": 0,
            "feature_dim": 4, "subsample": 3,
            "max_input_length": 24, "max_target_length": 6,
            "batch_size": 4, "shuffle": True, "ignore_id": 0,
            "train": csvs["train"], "dev": csvs["dev"], "test": csvs["test"],
        },
        "model": {
            "enc": {"input_size": d, "output_size": d, "attention_heads": 2,
                    "linear_units": 32, "num_blocks": 1, "dropout_rate": 0.0,
                    "positional_dropout_rate": 0.0,
                    "attention_dropout_rate": 0.0, "input_layer": None,
                    "padding_idx": -1},
            "dec": {"input_size": vocab_size, "output_size": d,
                    "attention_heads": 2, "linear_units": 32, "num_blocks": 1,
                    "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
                    "attention_dropout_rate": 0.0, "input_layer": "embed",
                    "padding_idx": -1},
            "joint": {"vocab_size": vocab_size, "encoder_output_size": d,
                      "decoder_output_size": d, "joint_space_size": 16,
                      "joint_activation_type": "tanh"},
            "mask": {"encoder_left_mask": 4, "encoder_right_mask": 2,
                     "decoder_left_mask": 2},
        },
        "training": {"eval_or_not": True, "seed": 1, "epochs": 2,
                     "max_grad_norm": 200, "visualization": False,
                     "show_interval": 2, "save_model": "esp_tiny"},
        "optim": {"type": "sgd", "lr": 0.02, "momentum": 0.9,
                  "decay_ratio": 0.5, "weight_decay": 0,
                  "begin_to_adjust_lr": 0},
    })


def test_espnet_trainer_end_to_end(tmp_path):
    root = str(tmp_path / "synth")
    vocab_path, csvs = make_corpus(root)
    cfg = espnet_tiny_config(root, vocab_path, csvs)
    trainer = Trainer(cfg, exp_root=str(tmp_path / "egs"))
    assert trainer.is_espnet
    train_loader, dev_loader = trainer.make_loaders()
    losses = [trainer.train_epoch(e, train_loader) for e in range(2)]
    assert all(np.isfinite(losses))
    assert losses[1] < losses[0]
    cer = trainer.evaluate(1, dev_loader)
    assert np.isfinite(cer)
