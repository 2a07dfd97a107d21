"""On-device featurization (``data.on_device_features``).

The TPU-native data path (DESIGN.md §5a): the host ships host-prepadded raw
int16 waveforms (file I/O + edge-reflect + zero-pad only) and the log-mel /
stack / subsample frontend (``ops.features.extract_batch_padded``) runs
inside the compiled train/eval programs.  These tests pin:

* numerical parity of the device frontend with the host pipeline
  (``AudioDataset`` feature mode) across utterance lengths, including the
  short- and over-length boundary cases;
* the Trainer integration — same losses as the host-featurized run, eval
  decode through the featurizing program, augment/CMVN contracts.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from data_helpers import make_corpus, tiny_train_config
from transformer_transducer_tpu.data.dataset import AudioDataset
from transformer_transducer_tpu.ops.features import (
    extract_batch_padded, padded_wave_samples)
from transformer_transducer_tpu.utils.config import Config
from transformer_transducer_tpu.utils.vocab import Vocabulary


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus_odf"))
    # lengths straddle the max_input_length=24 budget: cap is
    # (24-1)*3*160 = 11040 samples, corpus spans 3200..16000 so both
    # under- and over-length utterances occur
    vocab_path, csvs = make_corpus(root, n_train=8, max_len=16000)
    return root, vocab_path, csvs


def _datasets(corpus):
    root, vocab_path, csvs = corpus
    cfg = tiny_train_config(root, vocab_path, csvs).data
    vocab = Vocabulary.from_file(vocab_path)
    host = AudioDataset(cfg, "train", vocab)
    raw = AudioDataset(cfg, "train", vocab, on_device_features=True)
    return cfg, host, raw


def test_device_frontend_matches_host_pipeline(corpus):
    cfg, host, raw = _datasets(corpus)
    waves, n_samp, feats_host, t_host = [], [], [], []
    for i in range(len(host)):
        f, tl, _, _ = host[i]
        w, ns, _, _ = raw[i]
        feats_host.append(f)
        t_host.append(int(tl))
        waves.append(w)
        n_samp.append(int(ns))
    feats_dev, t_dev = jax.jit(
        lambda w, n: extract_batch_padded(
            w, n, cfg.max_input_length, n_mels=cfg.feature_dim,
            left=3, right=0, factor=3))(
        jnp.asarray(np.stack(waves)), jnp.asarray(n_samp))
    np.testing.assert_array_equal(np.asarray(t_dev), t_host)
    got = np.asarray(feats_dev)
    want = np.stack(feats_host)
    assert got.shape == want.shape
    # over-length utterances clip audio (device) vs feature rows (host):
    # the final valid feature row may differ — exclude exactly that row
    cap, _ = padded_wave_samples(cfg.max_input_length, 3)
    for i in range(len(host)):
        t = t_host[i]
        end = t - 1 if n_samp[i] >= cap else t
        np.testing.assert_allclose(got[i, :end], want[i, :end],
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"utt {i}")
        # pad rows are exactly zero, like the host pipeline's
        np.testing.assert_array_equal(got[i, t:], 0.0)


def test_right_context_stacking_matches(corpus):
    """right>0 pulls FUTURE log-mel rows into each feature row — the
    boundary zeroing before stacking must reproduce the host stack's
    zero-edge rule."""
    root, vocab_path, csvs = corpus
    cfg = tiny_train_config(root, vocab_path, csvs).data
    cfg.override("right_context_width", 2)
    cfg.override("feature_dim", 4)
    vocab = Vocabulary.from_file(vocab_path)
    host = AudioDataset(cfg, "train", vocab)
    raw = AudioDataset(cfg, "train", vocab, on_device_features=True)
    f, tl, _, _ = host[0]
    w, ns, _, _ = raw[0]
    feats_dev, t_dev = extract_batch_padded(
        jnp.asarray(w[None]), jnp.asarray([int(ns)]),
        cfg.max_input_length, n_mels=4, left=3, right=2, factor=3)
    assert int(t_dev[0]) == int(tl)
    np.testing.assert_allclose(np.asarray(feats_dev[0]), f,
                               rtol=2e-3, atol=2e-3)


def test_cmvn_rejected_with_on_device_features(corpus):
    root, vocab_path, csvs = corpus
    cfg = tiny_train_config(root, vocab_path, csvs).data
    vocab = Vocabulary.from_file(vocab_path)
    with pytest.raises(NotImplementedError, match="CMVN"):
        AudioDataset(cfg, "train", vocab, on_device_features=True,
                     cmvn=object())


@pytest.mark.slow  # trainer-level twin of device_frontend_matches_host
def test_trainer_on_device_features_matches_host(corpus, tmp_path):
    """`data.on_device_features: true` trains the same function: per-epoch
    losses match the host-featurized run to FFT-backend tolerance, and
    eval (loss + greedy decode) runs through the featurizing programs."""
    from transformer_transducer_tpu.training.trainer import Trainer
    root, vocab_path, csvs = corpus
    cfg = tiny_train_config(root, vocab_path, csvs)
    cfg_dev = copy.deepcopy(cfg)
    cfg_dev.override("data.on_device_features", True)
    cfg_dev.override("training.save_model", "tiny_odf")

    t_host = Trainer(cfg, exp_root=str(tmp_path / "host"))
    t_dev = Trainer(cfg_dev, exp_root=str(tmp_path / "dev"))
    h_loader, h_eval = t_host.make_loaders()
    d_loader, d_eval = t_dev.make_loaders()
    for epoch in range(2):
        l_h = t_host.train_epoch(epoch, h_loader)
        l_d = t_dev.train_epoch(epoch, d_loader)
        np.testing.assert_allclose(l_d, l_h, rtol=2e-3, atol=2e-3)
    cer = t_dev.evaluate(0, d_eval)
    assert np.isfinite(cer)


@pytest.mark.slow  # augment variant of the trainer-level twin
def test_trainer_on_device_features_with_augment(corpus, tmp_path):
    """Waveform augmentation stays host-side in raw mode (it operates on
    samples before padding); the run must remain finite."""
    from transformer_transducer_tpu.training.trainer import Trainer
    root, vocab_path, csvs = corpus
    cfg = tiny_train_config(root, vocab_path, csvs)
    cfg.override("data.on_device_features", True)
    t = Trainer(cfg, exp_root=str(tmp_path / "aug"))
    loader, _ = t.make_loaders(augment=True)
    loss = t.train_epoch(0, loader)
    assert np.isfinite(loss)
