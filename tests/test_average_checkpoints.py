"""n-best checkpoint averaging (``tools/average_checkpoints.py``).

Parity envelope: the reference vendors ESPnet2's
``average_nbest_models`` (``espnet2/main_funcs/average_nbest_models.py``)
unused; this exercises the working analog over the split-checkpoint layout —
metric-ranked epoch selection from ``metrics.jsonl``, leaf-wise averaging,
and loadability of the result through the standard loader into a model.
"""

import importlib.util
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from transformer_transducer_tpu.models.transducer import Transducer
from transformer_transducer_tpu.utils import checkpoint as ckpt_lib


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "average_checkpoints", os.path.join(
            os.path.dirname(__file__), "..", "tools",
            "average_checkpoints.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_model():
    return Transducer(vocab_size=12, enc=(1, 16, 2, 16, 8, 32),
                      dec=(1, 6, 2, 16, 8, 32), joint_inner=16)


def _init_params(seed):
    model = _tiny_model()
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(rng, (1, 8, 16))
    y = jnp.ones((1, 3), jnp.int32)
    return model, model.init(rng, x, y)["params"]


def test_average_is_leafwise_mean_and_loads(tmp_path):
    tool = _load_tool()
    model, p0 = _init_params(0)
    _, p1 = _init_params(1)
    _, p2 = _init_params(2)
    exp = str(tmp_path / "exp")
    for e, p in enumerate([p0, p1, p2]):
        ckpt_lib.save_checkpoint(os.path.join(exp, f"epoch_{e}"), p,
                                 epoch=e, step=e * 10)
    # metrics: epoch_1 best, epoch_0 second, epoch_2 worst
    with open(os.path.join(exp, "metrics.jsonl"), "w") as fh:
        for e, cer in [(0, 30.0), (1, 10.0), (2, 50.0)]:
            fh.write(json.dumps({"tag": "cer", "value": cer, "step": e})
                     + "\n")
            fh.write(json.dumps({"tag": "eval_loss", "value": cer / 2,
                                 "step": e}) + "\n")

    out = tool.main([exp, "--nbest", "2", "--criterion", "cer"])
    assert os.path.basename(out) == "ave_2best_cer"
    with open(os.path.join(out, "meta.json")) as fh:
        meta = json.load(fh)
    assert meta["averaged_from"] == ["epoch_1", "epoch_0"]

    avg, _, _ = ckpt_lib.load_checkpoint(out, p0)
    expect = jax.tree_util.tree_map(lambda a, b: (np.asarray(a, np.float64)
                                                  + np.asarray(b, np.float64))
                                    / 2, p0, p1)
    flat_a, _ = jax.tree_util.tree_flatten(avg)
    flat_e, _ = jax.tree_util.tree_flatten(expect)
    for a, e in zip(flat_a, flat_e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e, np.float32),
                                   rtol=1e-6, atol=1e-7)

    # the averaged checkpoint drives the model like any other
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 16))
    enc = model.apply({"params": avg}, x, method=model.encode)
    assert np.isfinite(np.asarray(enc)).all()


def test_nbest_1_copies_best(tmp_path):
    tool = _load_tool()
    _, p0 = _init_params(0)
    _, p1 = _init_params(1)
    exp = str(tmp_path / "exp")
    for e, p in enumerate([p0, p1]):
        ckpt_lib.save_checkpoint(os.path.join(exp, f"epoch_{e}"), p, epoch=e)
    with open(os.path.join(exp, "metrics.jsonl"), "w") as fh:
        fh.write(json.dumps({"tag": "cer", "value": 5.0, "step": 1}) + "\n")
        fh.write(json.dumps({"tag": "cer", "value": 9.0, "step": 0}) + "\n")
    out = tool.main([exp, "--nbest", "1"])
    best, _, _ = ckpt_lib.load_checkpoint(out, p0)
    flat_b, _ = jax.tree_util.tree_flatten(best)
    flat_1, _ = jax.tree_util.tree_flatten(p1)
    for a, b in zip(flat_b, flat_1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_explicit_checkpoint_list(tmp_path):
    tool = _load_tool()
    _, p0 = _init_params(0)
    _, p1 = _init_params(1)
    a = ckpt_lib.save_checkpoint(str(tmp_path / "a"), p0)
    b = ckpt_lib.save_checkpoint(str(tmp_path / "b"), p1)
    out = tool.main(["--checkpoints", a, b, "--out", str(tmp_path / "avg")])
    got, _, meta = ckpt_lib.load_checkpoint(out, p0)
    assert sorted(meta["averaged_from"]) == ["a", "b"]
    some = np.asarray(jax.tree_util.tree_leaves(got)[0])
    e0 = np.asarray(jax.tree_util.tree_leaves(p0)[0])
    e1 = np.asarray(jax.tree_util.tree_leaves(p1)[0])
    np.testing.assert_allclose(some, (e0.astype(np.float64)
                                      + e1.astype(np.float64)) / 2,
                               rtol=1e-6, atol=1e-7)
