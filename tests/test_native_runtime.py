"""C++ runtime library vs the Python fallbacks."""

import shutil

import numpy as np
import pytest

from transformer_transducer_tpu.runtime import native
from transformer_transducer_tpu.utils.metrics import _levenshtein_numpy


@pytest.fixture(scope="module")
def lib():
    if shutil.which("g++") is None:
        pytest.skip("no g++ in environment")
    assert native.build(), "native build failed"
    native._TRIED = False
    native._LIB = None
    lib = native.library_or_none()
    assert lib is not None
    return lib


def test_levenshtein_matches_python(lib):
    rng = np.random.RandomState(0)
    for _ in range(100):
        a = rng.randint(0, 6, size=rng.randint(0, 20)).astype(np.int32)
        b = rng.randint(0, 6, size=rng.randint(0, 20)).astype(np.int32)
        assert lib.levenshtein(a, b) == _levenshtein_numpy(list(a), list(b))


def test_batch_levenshtein(lib):
    preds = [[1, 2, 3], [4, 5], []]
    refs = [[1, 2, 4], [4, 5, 6], [7]]
    dist, total = lib.batch_levenshtein(preds, refs)
    assert dist == 1 + 1 + 1
    assert total == 3 + 3 + 1


def test_parse_wav_roundtrip(lib, tmp_path):
    from transformer_transducer_tpu.data.wav import write_wave
    rng = np.random.RandomState(1)
    samples = (rng.randn(4321) * 5000).astype(np.int16)
    p = tmp_path / "t.wav"
    write_wave(str(p), samples, 16000)
    got, rate = lib.parse_wav(p.read_bytes())
    assert rate == 16000
    np.testing.assert_array_equal(got, samples)


def test_metrics_uses_native_when_built(lib):
    from transformer_transducer_tpu.utils import metrics
    metrics._NATIVE = False  # force re-probe
    assert metrics.levenshtein([1, 2, 3], [1, 3]) == 1
    assert metrics.levenshtein([1, 2, 3], [4, 5, 6]) == 3


def test_native_logmel_matches_numpy(lib):
    from transformer_transducer_tpu.ops import features_np as F
    rng = np.random.RandomState(7)
    wav = (rng.randn(16000) * 3000).astype(np.int16)
    mel = F.mel_filterbank(16000, 512, 32)
    for variant, ref_fn in [("masked", F.logmel_masked), ("eps", F.logmel_eps)]:
        got = lib.logmel(wav, mel, 512, 160, variant)
        assert got is not None
        ref = ref_fn(wav, 16000, 32)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_native_features_env_routing(lib, monkeypatch):
    """TTX_NATIVE_FEATURES=1 routes logmel_* through the C++ featurizer;
    the output must agree with the numpy path it replaces."""
    from transformer_transducer_tpu.ops import features_np as F
    rng = np.random.RandomState(8)
    wav = (rng.randn(12000) * 2000).astype(np.int16)
    ref = F.logmel_eps(wav, 16000, 16)
    monkeypatch.setenv("TTX_NATIVE_FEATURES", "1")
    got = F.logmel_eps(wav, 16000, 16)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    # float input falls back to numpy identically
    ref_f = F.logmel_masked(wav.astype(np.float32), 16000, 16)
    np.testing.assert_array_equal(ref_f, F.logmel_masked(
        wav.astype(np.float32), 16000, 16))


def test_parse_wav_rejects_malformed_headers():
    """Regression: a truncated fmt chunk must not read out of bounds and
    channels == 0 must not SIGFPE the host process — both return None."""
    import struct
    lib = native.library_or_none()
    if lib is None:
        pytest.skip("native library unavailable")
    truncated = (b"RIFF" + b"\x24\x00\x00\x00" + b"WAVE"
                 + b"fmt " + b"\x10\x00\x00\x00" + b"\x00\x00")
    fmt = struct.pack("<HHIIHH", 1, 0, 16000, 32000, 2, 16)
    zero_ch = (b"RIFF" + b"\x28\x00\x00\x00" + b"WAVE"
               + b"fmt " + struct.pack("<I", 16) + fmt
               + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    for blob in (truncated, zero_ch):
        assert lib.parse_wav(np.frombuffer(blob, np.uint8)) is None
