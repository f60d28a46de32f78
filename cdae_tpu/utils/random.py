"""Global host-side RNG facade (ref: src/base/random.hpp:13-82).

The reference keeps one process-wide mt19937_64 behind static methods
(Random::seed/uniform/normal/shuffle/...). Device-side randomness in this
framework uses jax PRNG keys (functional, reproducible under jit); this
facade covers the HOST-side uses — seeding, splits, shuffles — with the same
call surface.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np

_rng = np.random.default_rng(0)


def seed(n: int) -> None:
    """ref Random::seed (random.hpp:21-23)."""
    global _rng
    _rng = np.random.default_rng(int(n))


def timed_seed() -> None:
    """ref Random::timed_seed (random.hpp:25-28)."""
    seed(time.time_ns() & 0xFFFFFFFF)


def generator() -> np.random.Generator:
    return _rng


def uniform(low: float = 0.0, high: float = 1.0, size=None):
    return _rng.uniform(low, high, size)


def uniform_int(low: int, high: int, size=None):
    """Uniform integer in [low, high) (ref random.hpp:38-44)."""
    return _rng.integers(low, high, size)


def normal(mean: float = 0.0, std: float = 1.0, size=None):
    return _rng.normal(mean, std, size)


def shuffle(x) -> None:
    """In-place shuffle (ref random.hpp:56-60)."""
    _rng.shuffle(x)


def discrete(weights: Sequence[float], size=None):
    """Sample indices proportionally to weights (ref random.hpp:62-73)."""
    w = np.asarray(weights, dtype=np.float64)
    return _rng.choice(len(w), size=size, p=w / w.sum())
