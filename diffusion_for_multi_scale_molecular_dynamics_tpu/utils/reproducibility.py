"""Seeding helpers.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/utils/reproducibility_utils.py:7)
"""

import random

import numpy as np


def set_seed(seed: int) -> None:
    """Seed host-side RNGs (JAX randomness is explicit-key and needs no seed)."""
    random.seed(seed)
    np.random.seed(seed)
