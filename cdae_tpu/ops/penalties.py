"""L1/L2 regularization penalties (ref: src/model/penalty.hpp:11-67).

``evaluate`` returns the raw norm of a whole array (squaredNorm for L2,
lpNorm<1> for L1), matching the reference's Penalty::evaluate; models apply
their own 0.5*lambda scaling (ref cdae.hpp:103-107).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable

import jax.numpy as jnp


class PenaltyType(enum.Enum):
    L1 = "L1"
    L2 = "L2"

    @classmethod
    def parse(cls, name: str) -> "PenaltyType":
        return cls(name.upper())


def _l2(mat) -> jnp.ndarray:
    return jnp.sum(jnp.square(mat))


def _l1(mat) -> jnp.ndarray:
    return jnp.sum(jnp.abs(mat))


@dataclasses.dataclass(frozen=True)
class Penalty:
    kind: PenaltyType
    evaluate: Callable
    is_smooth: bool

    @property
    def name(self) -> str:
        return self.kind.value

    @staticmethod
    def create(pt) -> "Penalty":
        if isinstance(pt, str):
            pt = PenaltyType.parse(pt)
        return _REGISTRY[pt]


_REGISTRY = {
    PenaltyType.L2: Penalty(PenaltyType.L2, _l2, True),
    PenaltyType.L1: Penalty(PenaltyType.L1, _l1, False),
}
