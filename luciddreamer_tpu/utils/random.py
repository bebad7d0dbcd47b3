"""Deterministic seeding (reference utils/general.py:119-140 safe_state)."""
from __future__ import annotations

import random

import numpy as np
import jax


def seed_everything(seed: int = 0) -> jax.Array:
    """Seed python + numpy and return a jax PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
