"""YAML configuration with attribute access.

Parity surface: the reference drives everything from YAML files loaded into an
``AttrDict`` whose missing keys resolve to ``None`` (reference:
``tt/utils.py:11-27``, consumed at ``train.py:150-151``).  Missing-key==None is
load-bearing there (e.g. ``share_embedding`` / ``step_wise_update`` are never
defined in the shipped configs and must be falsy), so :class:`Config`
reproduces exactly that contract while adding round-tripping and overrides.
"""

from __future__ import annotations

import copy
from typing import Any, Mapping

import yaml


class Config(dict):
    """A dict whose keys are attribute-accessible; missing keys -> ``None``.

    Nested dicts are lazily wrapped so ``cfg.model.enc.n_layer`` works.
    """

    def __getattr__(self, item: str) -> Any:
        if item.startswith("__") and item.endswith("__"):
            raise AttributeError(item)
        if item not in self:
            return None
        value = self[item]
        if type(value) is dict:
            value = Config(value)
            self[item] = value
        return value

    def __setattr__(self, item: str, value: Any) -> None:
        self[item] = value

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        out = {}
        for key, value in self.items():
            if isinstance(value, Config):
                value = value.to_dict()
            out[key] = value
        return out

    def override(self, dotted_key: str, value: Any) -> "Config":
        """Set ``a.b.c`` style key paths (used by CLI ``--set`` overrides)."""
        parts = dotted_key.split(".")
        node = self
        for part in parts[:-1]:
            nxt = node.get(part)
            if not isinstance(nxt, dict):
                nxt = Config()
                node[part] = nxt
            elif type(nxt) is dict:
                nxt = Config(nxt)
                node[part] = nxt
            node = nxt
        node[parts[-1]] = value
        return self


def load_config(path_or_stream, overrides: Mapping[str, Any] | None = None) -> Config:
    """Load a YAML config file (same schema as the reference ``config/*.yaml``)."""
    if hasattr(path_or_stream, "read"):
        raw = yaml.safe_load(path_or_stream)
    else:
        with open(path_or_stream, "r") as fh:
            raw = yaml.safe_load(fh)
    cfg = Config(raw or {})
    for key, value in (overrides or {}).items():
        cfg.override(key, value)
    return cfg


def dump_config(cfg: Config, path: str) -> None:
    with open(path, "w") as fh:
        yaml.safe_dump(cfg.to_dict() if isinstance(cfg, Config) else cfg, fh,
                       sort_keys=False, allow_unicode=True)


def apply_overrides(cfg, pairs):
    """Apply CLI ``KEY=VALUE`` override pairs (dotted keys; values parsed as
    Python literals when possible, else kept as strings).  The ONE home of
    --set semantics for every CLI entry point."""
    import ast
    for kv in pairs or []:
        key, value = kv.split("=", 1)
        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
        cfg.override(key, value)
    return cfg


def stack_context(data_cfg):
    """(left, right) frame-stacking context from a ``data:`` block with the
    FRAMEWORK-WIDE defaults (3, 0) — the reference frontend (every shipped
    config sets left 3 / right 0 explicitly; the reference has no default
    at all).  None-respecting: an explicit 0 stays 0.  Every consumer
    (dataset, apps, streaming session) must use this one helper — divergent
    `or 0` / `or 3` fallbacks once made a trained model and its decoder
    disagree on the input dimension."""
    left = data_cfg.left_context_width
    right = data_cfg.right_context_width
    return (3 if left is None else left), (0 if right is None else right)


def subsample_factor(data_cfg) -> int:
    """Frame-subsampling factor from a ``data:`` block, framework-wide
    default 3 (every shipped config sets it; None-respecting like
    stack_context -- train and inference MUST agree or the frame rates
    silently mismatch)."""
    f = data_cfg.subsample
    return 3 if f is None else f
