"""End-to-end checkpoint-converter test (VERDICT r2 next #9).

Covers the CLI + file-format path the in-memory parity tests skip: a random
reference PyTorch model is ``torch.save``-d in the reference's split
``.chkpt`` layout (``save_model``, ``tt/utils.py:80-91``), converted with
``tools/convert_checkpoint.py``, restored through ``utils/checkpoint.py``
into a FRESH (different-seed) model, and its greedy output must equal the
torch model's ``recognize`` exactly.
"""

import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_harness import load_reference_tt, tiny_model_config
from transformer_transducer_tpu.decoding.greedy import decode_reference_exact
from transformer_transducer_tpu.models.transducer import Transducer
from transformer_transducer_tpu.utils import checkpoint as ckpt_lib


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "convert_checkpoint", os.path.join(os.path.dirname(__file__), "..",
                                           "tools", "convert_checkpoint.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_convert_reference_chkpt_end_to_end(tmp_path):
    tt = load_reference_tt()
    cfg = tiny_model_config()
    torch.manual_seed(3)
    ref = tt.model.Transducer(cfg)
    ref.eval()

    # the reference's exact on-disk layout (tt/utils.py:80-91); a real
    # optimizer state_dict stands in for the sgd state the converter drops
    chkpt = str(tmp_path / "epoch7.chkpt")
    opt = torch.optim.SGD(ref.parameters(), lr=0.1)
    torch.save({"encoder": ref.encoder.state_dict(),
                "decoder": ref.decoder.state_dict(),
                "joint": ref.joint.state_dict(),
                "optimizer": opt.state_dict(),
                "epoch": 7, "step": 1234}, chkpt)

    out_dir = str(tmp_path / "converted")
    _load_tool().main([chkpt, out_dir])
    for comp in ("encoder", "decoder", "joint"):
        assert os.path.exists(os.path.join(out_dir, comp + ".msgpack"))

    # restore into a DIFFERENT-seed fresh init: every surviving value must
    # come from the checkpoint, not the template
    model = Transducer(vocab_size=cfg.vocab_size,
                       enc=(cfg.enc.n_layer, cfg.enc.max_input_length,
                            cfg.enc.n_head, cfg.enc.d_model, cfg.enc.d_head,
                            cfg.enc.d_inner),
                       dec=(cfg.dec.n_layer, cfg.dec.max_target_length,
                            cfg.dec.n_head, cfg.dec.d_model, cfg.dec.d_head,
                            cfg.dec.d_inner),
                       joint_inner=cfg.joint.inner_size, dropout=0.0)
    x0 = jnp.zeros((1, 8, cfg.enc.d_model))
    y0 = jnp.zeros((1, 4), jnp.int32)
    fresh = model.init(jax.random.PRNGKey(99), x0, y0)["params"]
    params, opt_state, meta = ckpt_lib.load_checkpoint(out_dir, fresh)
    assert opt_state is None  # torch optimizer moments are not portable
    assert meta["epoch"] == 7 and meta["step"] == 1234
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}

    rng = np.random.RandomState(11)
    x = rng.randn(2, 10, cfg.enc.d_model).astype(np.float32) * 2
    lens = [10, 6]
    with torch.no_grad():
        ref_res = ref.recognize(torch.from_numpy(x),
                                inputs_length=torch.tensor(lens))
    enc = np.asarray(model.apply(variables, jnp.asarray(x), None,
                                 method=Transducer.encode))
    for i, t_len in enumerate(lens):
        got = decode_reference_exact(model, variables, enc[i], t_len)
        assert got == ref_res[i], f"utt {i}: {got} != {ref_res[i]}"
