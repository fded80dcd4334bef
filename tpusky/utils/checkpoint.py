"""Checkpoint / resume for inverse-rendering loops (SURVEY.md §5).

The reference keeps Adam state in Python with no serialisation
(`ad/optimizers.py`); long TPU optimisation loops want restartability, so
this provides atomic pickle save/restore of the full (params, opt_state,
rng, step) pytree (arrays are pulled to host as numpy first, so
checkpoints are device-independent).
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def save_checkpoint(path: str, state) -> None:
    """Save a pytree checkpoint (atomic rename)."""
    host = jax.tree.map(lambda x: np.asarray(x), state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host, f)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """Load a checkpoint saved by `save_checkpoint` (None if absent)."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)
