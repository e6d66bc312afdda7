"""Misc utilities (counterpart of /root/reference/utils/misc.py)."""

from __future__ import annotations

import json
import random

import numpy as np


class NumpyEncoder(json.JSONEncoder):
    """JSON encoder accepting numpy scalars/arrays (utils/misc.py:16-20)."""

    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        return super().default(obj)


def fix_random_seeds(seed: int = 0) -> None:
    """Seed python/numpy RNGs (utils/misc.py:98-105).  JAX randomness is
    explicit via PRNG keys derived from cfg.optim.seed."""
    random.seed(seed)
    np.random.seed(seed)
