"""Split checkpoints — encoder / decoder / joint / optimizer / counters.

Parity surface: the reference saves split state dicts ``{encoder, decoder,
joint, optimizer, epoch, step}`` per epoch (``tt/utils.py:80-91``,
``train.py:249-250``) and its loaders can pull the encoder or decoder
independently (``train.py:196-212``) — that independence powers the apps.
Same layout here, one msgpack file per component plus a JSON meta file, so
partial loads stay cheap (no monolithic file parse).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import flax.serialization
import jax

COMPONENTS = ("encoder", "decoder", "joint")


def save_checkpoint(path: str, params: Dict, opt_state: Any = None,
                    epoch: int = 0, step: int = 0,
                    extra: Optional[Dict] = None) -> str:
    """Write a split checkpoint directory; returns ``path``."""
    os.makedirs(path, exist_ok=True)
    params = jax.device_get(params)
    for comp in COMPONENTS:
        with open(os.path.join(path, f"{comp}.msgpack"), "wb") as fh:
            fh.write(flax.serialization.to_bytes(params[comp]))
    if opt_state is not None:
        with open(os.path.join(path, "optimizer.msgpack"), "wb") as fh:
            fh.write(flax.serialization.to_bytes(jax.device_get(opt_state)))
    meta = {"epoch": int(epoch), "step": int(step)}
    meta.update(extra or {})
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return path


def save_partial_checkpoint(path: str, params: Dict, components,
                            opt_state: Any = None, epoch: int = 0,
                            step: int = 0) -> str:
    """Checkpoint an arbitrary subset of top-level components — the analog
    of the reference's CTC / language-model save variants
    (``save_ctc_model`` / ``save_language_model``, ``tt/utils.py:94-118``),
    which persist {encoder, project_layer} / {decoder, project_layer}
    subsets for pre-training workflows.  ``components`` are top-level keys
    of ``params``; ``load_component`` reads them back individually."""
    os.makedirs(path, exist_ok=True)
    params = jax.device_get(params)
    for comp in components:
        with open(os.path.join(path, f"{comp}.msgpack"), "wb") as fh:
            fh.write(flax.serialization.to_bytes(params[comp]))
    if opt_state is not None:
        with open(os.path.join(path, "optimizer.msgpack"), "wb") as fh:
            fh.write(flax.serialization.to_bytes(jax.device_get(opt_state)))
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump({"epoch": int(epoch), "step": int(step),
                   "components": list(components)}, fh)
    return path


def load_component(path: str, comp: str, template: Any) -> Any:
    with open(os.path.join(path, f"{comp}.msgpack"), "rb") as fh:
        return flax.serialization.from_bytes(template, fh.read())


def load_checkpoint(path: str, params_template: Dict,
                    opt_state_template: Any = None):
    """Restore (params, opt_state, meta); ``opt_state`` is None when not
    requested or absent."""
    params = dict(params_template)
    for comp in COMPONENTS:
        params[comp] = load_component(path, comp, params_template[comp])
    opt_state = None
    opt_path = os.path.join(path, "optimizer.msgpack")
    if opt_state_template is not None and os.path.exists(opt_path):
        with open(opt_path, "rb") as fh:
            opt_state = flax.serialization.from_bytes(opt_state_template, fh.read())
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    return params, opt_state, meta


def latest_checkpoint(exp_dir: str) -> Optional[str]:
    """Newest checkpoint directory under ``exp_dir`` by global step, or None.

    Both ``epoch_*`` (end-of-epoch) and ``step_*`` (mid-epoch,
    preemption-safe; ``training.save_every_steps``) checkpoints count; on a
    step tie the epoch checkpoint wins (it additionally carries the decayed
    next-epoch LR)."""
    if not os.path.isdir(exp_dir):
        return None
    best = None           # (step, is_epoch, path)
    for d in os.listdir(exp_dir):
        if not (d.startswith("epoch_") or d.startswith("step_")):
            continue
        meta_path = os.path.join(exp_dir, d, "meta.json")
        if not os.path.exists(meta_path):
            continue
        with open(meta_path) as fh:
            meta = json.load(fh)
        key = (int(meta.get("step", 0)), d.startswith("epoch_"),
               os.path.join(exp_dir, d))
        if best is None or key > best:
            best = key
    return best[2] if best else None


def prune_step_checkpoints(exp_dir: str, keep: Optional[str] = None) -> None:
    """Delete ``step_*`` checkpoint directories except ``keep`` (a path).

    Mid-epoch checkpoints are recovery artifacts, not history — the trainer
    keeps only the newest one and drops them all once the epoch checkpoint
    lands."""
    import shutil
    if not os.path.isdir(exp_dir):
        return
    for d in os.listdir(exp_dir):
        path = os.path.join(exp_dir, d)
        if d.startswith("step_") and path != keep:
            shutil.rmtree(path, ignore_errors=True)
