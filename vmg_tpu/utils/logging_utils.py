"""Logging + meters (reference ``utils/logger.py``, ``utils/average_meter.py``)."""

from __future__ import annotations

import logging
import os
import sys
import time


def setup_logger(name: str = "base", root: str = ".", phase: str = "train",
                 level=logging.INFO, screen: bool = True, tofile: bool = True):
    logger = logging.getLogger(name)
    logger.propagate = False
    if logger.handlers:
        return logger
    fmt = logging.Formatter(
        "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s", "%y-%m-%d %H:%M:%S"
    )
    logger.setLevel(level)
    if tofile:
        os.makedirs(root, exist_ok=True)
        path = os.path.join(root, f"{phase}_{int(time.time())}.log")
        fh = logging.FileHandler(path, mode="w")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    if screen:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    return logger


class AverageMeter:
    """Weighted running average (reference utils/average_meter.py)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    def average(self):
        return self.sum / self.count if self.count else 0.0
