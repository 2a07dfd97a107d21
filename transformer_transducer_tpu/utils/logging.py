"""Console + file logging (parity: reference ``tt/utils.py:30-43``)."""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional


def init_logger(log_file: Optional[str] = None, name: Optional[str] = None) -> logging.Logger:
    fmt = logging.Formatter("[%(asctime)s %(levelname)s] %(message)s")
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)

    console = logging.StreamHandler()
    console.setFormatter(fmt)
    logger.handlers = [console]

    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class MetricsWriter:
    """JSONL scalar metrics writer (replaces the reference's tensorboardX
    ``SummaryWriter`` usage at ``train.py:162-166``); also mirrors to
    tensorboardX when importable."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._fh = open(os.path.join(log_dir, "metrics.jsonl"), "a", buffering=1)
        self._tb = None
        try:  # pragma: no cover - optional dependency
            from tensorboardX import SummaryWriter
            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._tb = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        rec: Dict[str, Any] = {"tag": tag, "value": float(value), "step": int(step),
                               "time": time.time()}
        self._fh.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self) -> None:
        self._fh.close()
        if self._tb is not None:
            self._tb.close()
