import json
import os

import numpy as np
import pytest

from transformer_transducer_tpu.data import kaldiio, prep
from transformer_transducer_tpu.data.dataset import AudioDataset, CMVN, read_manifest
from transformer_transducer_tpu.data.wav import write_wave
from transformer_transducer_tpu.utils.config import Config
from transformer_transducer_tpu.utils.vocab import Vocabulary


def _wav(path, n=3200, seed=0):
    rng = np.random.RandomState(seed)
    write_wave(str(path), (rng.randn(n) * 3000).astype(np.int16))
    return str(path)


def test_kaldi_mat_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    m = rng.randn(7, 5).astype(np.float32)
    p = tmp_path / "m.mat"
    prep_off = kaldiio.write_mat(str(p), m)
    assert prep_off == 0
    np.testing.assert_array_equal(kaldiio.read_mat(str(p)), m)


def test_kaldi_ark_scp_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    mats = {f"utt{i}": rng.randn(4 + i, 3).astype(np.float32) for i in range(3)}
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    kaldiio.write_ark_scp(ark, scp, mats)
    via_scp = dict(kaldiio.read_mat_scp(scp))
    via_ark = dict(kaldiio.read_mat_ark(ark))
    for k, m in mats.items():
        np.testing.assert_array_equal(via_scp[k], m)
        np.testing.assert_array_equal(via_ark[k], m)


def test_kaldi_compressed_matrix_roundtrip(tmp_path):
    """'CM ' format 1 (reference tt/kaldi_io.py:470-518): lossy uint8
    round-trip; error bounded by the per-segment quantization step."""
    rng = np.random.RandomState(2)
    m = (rng.randn(64, 13) * 4.0 + 1.5).astype(np.float32)
    p = tmp_path / "c.mat"
    off = kaldiio.write_mat_compressed(str(p), m)
    assert off == 0
    got = kaldiio.read_mat(str(p))
    assert got.shape == m.shape and got.dtype == np.float32
    # worst segment has 63 steps over <= the global range
    grange = float(m.max() - m.min())
    assert np.abs(got - m).max() <= grange / 63.0 + 1e-4
    # interior (p25..p75) values get 128 steps over the IQR — much tighter
    q25, q75 = np.percentile(m, [30, 70])
    sel = (m > q25) & (m < q75)
    assert np.abs(got[sel] - m[sel]).max() <= (q75 - q25) / 32.0


def test_kaldi_compressed_in_ark_with_offset(tmp_path):
    """CM blobs behind key + path:offset plumbing (the shape CMVN stats
    from real Kaldi tooling arrive in)."""
    rng = np.random.RandomState(3)
    m = rng.rand(20, 7).astype(np.float32) * 10.0
    ark = str(tmp_path / "c.ark")
    with open(ark, "wb") as fh:
        fh.write(b"spk1 ")
        off = kaldiio.write_mat_compressed(fh, m)
    got = kaldiio.read_mat(f"{ark}:{off}")
    assert np.abs(got - m).max() < 10.0 / 63.0 + 1e-4
    (key, via_ark), = list(kaldiio.read_mat_ark(ark))
    assert key == "spk1"
    np.testing.assert_array_equal(via_ark, got)


def test_kaldi_cm2_cm3_rejected(tmp_path):
    p = tmp_path / "c2.mat"
    p.write_bytes(b"\x00BCM2 " + b"\x00" * 16)
    with pytest.raises(ValueError, match="CM2"):
        kaldiio.read_mat(str(p))


def test_kaldi_text_matrix(tmp_path):
    p = tmp_path / "t.mat"
    p.write_text(" [\n 1.0 2.0\n 3.0 4.5 ]\n")
    np.testing.assert_allclose(kaldiio.read_mat(str(p)),
                               [[1.0, 2.0], [3.0, 4.5]])


def test_aishell_importer_and_pipeline(tmp_path):
    # synthetic AISHELL-1 layout
    root = tmp_path / "aishell"
    os.makedirs(root / "transcript")
    os.makedirs(root / "wav" / "train" / "S0001")
    utts = {}
    for i in range(4):
        utt = f"BAC009S0001W{i:04d}"
        _wav(root / "wav" / "train" / "S0001" / f"{utt}.wav", seed=i)
        utts[utt] = "你 好 世界"[: 2 * (i % 2) + 3]
    with open(root / "transcript" / "aishell_transcript_v0.8.txt", "w") as fh:
        for utt, text in utts.items():
            fh.write(f"{utt} {text}\n")

    rows = prep.import_aishell(str(root), "train")
    assert len(rows) == 4
    assert all(" " not in label for _, label in rows)

    train_csv = str(tmp_path / "train.csv")
    prep.write_manifest(rows, train_csv)
    assert len(read_manifest(train_csv)) == 4

    vocab_path = str(tmp_path / "vocab.txt")
    vocab = prep.build_grapheme_table([train_csv], vocab_path)
    assert vocab.word2index["<b>"] == 0
    assert "你" in vocab.word2index

    stats = prep.target_length_stats(train_csv)
    assert stats["count"] == 4 and stats["max"] >= stats["min"]

    clipped_csv = str(tmp_path / "clipped.csv")
    kept, dropped = prep.clip_by_length(train_csv, clipped_csv,
                                        max_label_len=3)
    assert kept + dropped == 4

    merged = str(tmp_path / "merged.csv")
    n = prep.merge_manifests([train_csv, clipped_csv], merged)
    assert n == 4 + kept


def test_other_importers(tmp_path):
    # THCHS30
    th = tmp_path / "thchs30" / "train"
    os.makedirs(th)
    _wav(th / "A1_0.wav")
    (th / "A1_0.wav.trn").write_text("绿 是 阳春\nlv shi\n")
    rows = prep.import_thchs30(str(tmp_path / "thchs30"), "train")
    assert rows[0][1] == "绿是阳春"

    # ST-CMDS
    st = tmp_path / "stcmds"
    os.makedirs(st)
    _wav(st / "20170001P00001A0001.wav")
    (st / "20170001P00001A0001.txt").write_text("今天 天气")
    rows = prep.import_stcmds(str(st))
    assert rows[0][1] == "今天天气"

    # magicdata
    md = tmp_path / "magic" / "train" / "SPK1"
    os.makedirs(md)
    _wav(md / "u1.wav")
    (tmp_path / "magic" / "train" / "TRANS.txt").write_text(
        "UtteranceID\tSpeakerID\tTranscription\nu1.wav\tSPK1\t你好 吗\n")
    rows = prep.import_magicdata(str(tmp_path / "magic"), "train")
    assert rows[0][1] == "你好吗"

    # primewords
    pw = tmp_path / "prime" / "audio_files" / "0"
    os.makedirs(pw)
    _wav(pw / "x.wav")
    (tmp_path / "prime" / "set1_transcript.json").write_text(
        json.dumps([{"file": "x.wav", "text": "早上 好"}]))
    rows = prep.import_primewords(str(tmp_path / "prime"))
    assert rows[0][1] == "早上好"

    # aidatatang
    ad = tmp_path / "aida" / "corpus" / "train" / "G0001"
    os.makedirs(ad)
    _wav(ad / "T0001.wav")
    (ad / "T0001.txt").write_text("晚上 好")
    rows = prep.import_aidatatang(str(tmp_path / "aida"), "train")
    assert rows[0][1] == "晚上好"


def test_feature_dump_and_cmvn(tmp_path):
    wavs = [_wav(tmp_path / f"u{i}.wav", seed=i) for i in range(2)]
    csv_path = str(tmp_path / "m.csv")
    prep.write_manifest([(w, "ab") for w in wavs], csv_path)
    ark, scp = str(tmp_path / "f.ark"), str(tmp_path / "f.scp")
    n = prep.dump_features(csv_path, ark, scp, feature_dim=8)
    assert n == 2
    feats = dict(kaldiio.read_mat_scp(scp))
    assert len(feats) == 2
    for m in feats.values():
        assert m.shape[1] == 8 * 4

    # CMVN stats consumed by the dataset normalizer
    any_feats = next(iter(feats.values()))
    stats = kaldiio.cmvn_stats(any_feats)
    cm = CMVN({"utt": "spk"}, {"spk": stats})
    out = cm("utt", any_feats)
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=0), 1.0, atol=1e-2)


def test_short_first_orders_train_rows(tmp_path):
    """data.short_first sorts train rows by label length ascending — the
    reference declares the flag but left it a commented TODO
    (``tt/dataset.py:78-82``); here it works (train split only)."""
    wavs = [_wav(tmp_path / f"s{i}.wav", seed=i) for i in range(3)]
    csv_path = str(tmp_path / "sf.csv")
    prep.write_manifest(list(zip(wavs, ["abba", "a", "ab"])), csv_path)
    vocab = Vocabulary.from_symbols(["a", "b"])
    cfg = Config({"train": csv_path, "dev": csv_path, "feature_dim": 8,
                  "max_input_length": 16, "max_target_length": 6,
                  "short_first": True})
    ds = AudioDataset(cfg, "train", vocab)
    assert [len(r[1]) for r in ds.rows] == [1, 2, 4]
    # non-train splits keep manifest order
    dev = AudioDataset(cfg, "dev", vocab)
    assert [len(r[1]) for r in dev.rows] == [4, 1, 2]


def test_audio_duration_stats(tmp_path):
    """audio-stats parity (reference ``audio_info``,
    ``data/data_process.py:600-651``): subsampled frame counts
    ceil(ceil(samples/160)/3), histogram + cumulative coverage."""
    wavs = [_wav(tmp_path / f"d{i}.wav", n=3200 * (i + 1), seed=i)
            for i in range(3)]
    csv_path = str(tmp_path / "dur.csv")
    prep.write_manifest(list(zip(wavs, ["a", "bb", "ccc"])), csv_path)
    stats = prep.audio_duration_stats(csv_path)
    # 3200*(i+1) samples -> ceil(ceil(3200*(i+1)/160)/3) = ceil(20*(i+1)/3)
    expect = [-(-20 * (i + 1) // 3) for i in range(3)]
    assert stats["count"] == 3
    assert stats["max_frames"] == max(expect)
    assert stats["max_file"] == wavs[2]
    assert stats["mean_frames"] == pytest.approx(np.mean(expect))
    assert stats["histogram"] == {n: 1 for n in expect}
    # every utterance fits inside the first coverage limit (100 frames)
    assert stats["coverage"][0]["limit"] == 100
    assert stats["coverage"][0]["pct"] == 100.0
    # the final coverage bucket must always reach 100% (the table is
    # rounded UP to the next step past max_frames — round-3 regression:
    # a max of e.g. 130 frames used to stop the table at limit 100)
    stats2 = prep.audio_duration_stats(csv_path, coverage_start=10,
                                       coverage_step=7)
    assert stats2["coverage"][-1]["limit"] >= stats2["max_frames"]
    assert stats2["coverage"][-1]["pct"] == 100.0
    assert stats2["coverage"][-1]["limit"] - stats2["max_frames"] < 7


def test_plot_features_tool(tmp_path):
    """Mel-spectrogram image dump (reference ``tensor_to_img``,
    ``tt/utils.py:332-336``) — wav and kaldi-matrix inputs both render."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "plot_features", os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "plot_features.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    wav = _wav(tmp_path / "p.wav", n=16000)
    out = str(tmp_path / "p.png")
    got = mod.main([wav, "--out", out, "--feature-dim", "32"])
    assert got == out and os.path.getsize(out) > 1000

    feats = mod.load_features(wav, feature_dim=32, stack=3, subsample=3)
    assert feats.shape[1] == 32 * 4

    mat = tmp_path / "m.mat"
    kaldiio.write_mat(str(mat), np.random.RandomState(0)
                      .randn(40, 16).astype(np.float32))
    out2 = str(tmp_path / "m.png")
    mod.main([str(mat), "--out", out2])
    assert os.path.getsize(out2) > 1000
