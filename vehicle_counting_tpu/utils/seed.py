"""Deterministic seeding (reference: utilities/random_seed.py:5-10)."""

from __future__ import annotations

import random

import numpy as np


def seed_everything(seed: int = 1702) -> None:
    random.seed(seed)
    np.random.seed(seed)
