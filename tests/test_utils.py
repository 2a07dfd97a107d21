import os
import tempfile

import numpy as np
import pytest

from transformer_transducer_tpu.utils.config import Config, load_config
from transformer_transducer_tpu.utils.metrics import levenshtein, batch_cer, _levenshtein_numpy
from transformer_transducer_tpu.utils.vocab import Vocabulary


def test_config_missing_keys_are_none():
    cfg = Config({"model": {"enc": {"n_layer": 4}}})
    assert cfg.model.enc.n_layer == 4
    assert cfg.model.enc.not_there is None
    assert cfg.nothing is None
    # reference-parity: undefined share_embedding must be falsy
    assert not cfg.model.share_embedding


def test_config_yaml_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a:\n  b: 3\n  c: [1, 2]\n")
    cfg = load_config(str(p))
    assert cfg.a.b == 3 and cfg.a.c == [1, 2]
    cfg.override("a.d.e", 7)
    assert cfg.a.d.e == 7


def _brute_levenshtein(a, b):
    m, n = len(a), len(b)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        dp[i][0] = i
    for j in range(n + 1):
        dp[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1,
                           dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
    return dp[m][n]


def test_levenshtein_random():
    rng = np.random.RandomState(0)
    for _ in range(50):
        a = list(rng.randint(0, 5, size=rng.randint(0, 12)))
        b = list(rng.randint(0, 5, size=rng.randint(0, 12)))
        assert _levenshtein_numpy(a, b) == _brute_levenshtein(a, b)
        assert levenshtein(a, b) == _brute_levenshtein(a, b)


def test_batch_cer():
    dist, total = batch_cer([[1, 2, 3]], [[1, 2, 4]])
    assert dist == 1 and total == 3


def test_vocab_roundtrip(tmp_path):
    v = Vocabulary.from_symbols(["a", "b", "c", "<unk>"])
    assert len(v) == 5 and v.word2index["<b>"] == 0
    p = tmp_path / "vocab.txt"
    v.save(str(p))
    v2 = Vocabulary.from_file(str(p))
    assert v2.word2index == v.word2index
    assert v2.encode("abz") == [1, 2, v2.word2index["<unk>"]]
    assert v2.decode([1, 2]) == ["a", "b"]


def test_optimizer_parity_with_torch():
    """sgd/adam/adadelta with weight decay track torch.optim step-for-step:
    the reference's factory (tt/optim.py:56-75) uses torch's L2-style decay
    (grad += wd*param BEFORE the moment updates), not decoupled AdamW decay."""
    import jax.numpy as jnp
    import numpy as np
    import optax
    import torch
    from transformer_transducer_tpu.training import optim as optim_lib
    from transformer_transducer_tpu.utils.config import Config

    rng = np.random.RandomState(0)
    p0 = rng.randn(7, 3).astype(np.float32)
    grads = [rng.randn(7, 3).astype(np.float32) for _ in range(5)]
    cases = [
        ({"type": "adam", "lr": 1e-3, "weight_decay": 0.05},
         lambda p: torch.optim.Adam([p], lr=1e-3, betas=(0.9, 0.98),
                                    eps=1e-8, weight_decay=0.05)),
        ({"type": "sgd", "lr": 1e-2, "momentum": 0.9, "weight_decay": 0.05},
         lambda p: torch.optim.SGD([p], lr=1e-2, momentum=0.9,
                                   weight_decay=0.05)),
        ({"type": "adadelta", "lr": 0.5, "rho": 0.95, "eps": 1e-6,
          "weight_decay": 0.05},
         lambda p: torch.optim.Adadelta([p], lr=0.5, rho=0.95, eps=1e-6,
                                        weight_decay=0.05)),
    ]
    for cfg, make_topt in cases:
        tx = optim_lib.build_optimizer(Config(cfg))
        params = {"w": jnp.asarray(p0)}
        state = tx.init(params)
        tp = torch.nn.Parameter(torch.tensor(p0))
        topt = make_topt(tp)
        for g in grads:
            updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
            params = optax.apply_updates(params, updates)
            tp.grad = torch.tensor(g)
            topt.step()
        np.testing.assert_allclose(
            np.asarray(params["w"]), tp.detach().numpy(),
            rtol=2e-5, atol=2e-5,
            err_msg=f"optimizer {cfg['type']} diverged from torch")


def test_step_decay_schedule_selectable():
    """optim.schedule: step_decay wires the warmup-hold-decay schedule
    (the reference's step_decay_lr is buggy AND unreachable,
    tt/optim.py:35-55; here it is correct and selectable)."""
    import jax.numpy as jnp
    import numpy as np
    import optax
    from transformer_transducer_tpu.training import optim as optim_lib
    from transformer_transducer_tpu.utils.config import Config

    cfg = Config({"type": "adam", "lr": 1e-3, "schedule": "step_decay",
                  "warmup_steps": 10, "hold_steps": 20, "final_step": 40,
                  "init_lr": 1e-5, "min_lr": 1e-5})
    tx = optim_lib.build_optimizer(cfg, max_grad_norm=200.0)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((3,))}
    lrs = []   # lrs[k] = the LR applied by update k (schedule(k))
    for _ in range(41):
        _, state = tx.update(grads, state, params)
        lrs.append(optim_lib.get_learning_rate(state))
    # warmup rises to max, holds, then decays toward min
    assert lrs[0] < 2e-4
    np.testing.assert_allclose(lrs[10], 1e-3, rtol=1e-5)
    np.testing.assert_allclose(lrs[20], 1e-3, rtol=1e-5)
    assert lrs[30] < 1e-3
    np.testing.assert_allclose(lrs[40], 1e-5, rtol=1e-3)
    # python twin agrees
    py = optim_lib.step_decay_lr(30, 10, 20, 40, 1e-5, 1e-3, 1e-5)
    np.testing.assert_allclose(lrs[30], py, rtol=1e-5)
