"""Device meshes and sharding layouts (SURVEY §2e, §5 — the layer the
reference does not have: its only parallelism is std::thread within one
process, ref src/base/parallel/parallel_lambda.hpp:36-212).

Mesh axes:
  data  — users/batch axis (DP). The reference's per-user independence
          (cdae.hpp:136-146) makes user-axis DP exact.
  model — item/catalog axis (TP; doubles as the long-context/SP analog,
          SURVEY §5): W/V/b_prime rows, full-catalog decode, top-k.

PP and EP are not applicable to this workload (single hidden layer, no
experts; SURVEY §2e) — documented out of scope.

Everything is expressed as NamedSharding over a `jax.sharding.Mesh`; XLA's
SPMD partitioner inserts the all-gather / reduce-scatter / all-to-all
collectives that ride ICI.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    With only one axis size given, the other gets the remaining factor; with
    neither, all devices go to 'data' (pure DP — the safe default).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None and n_model is None:
        n_data, n_model = n, 1
    elif n_data is None:
        if n % n_model:
            raise ValueError(f"{n} devices not divisible by n_model={n_model}")
        n_data = n // n_model
    elif n_model is None:
        if n % n_data:
            raise ValueError(f"{n} devices not divisible by n_data={n_data}")
        n_model = n // n_data
    if n_data * n_model != n:
        raise ValueError(
            f"mesh {n_data}x{n_model} != {n} available devices"
        )
    return Mesh(np.array(devices).reshape(n_data, n_model), ("data", "model"))


def cdae_param_specs(params: Dict) -> Dict[str, P]:
    """PartitionSpecs for CDAE parameters (SURVEY §7 stage 6):
    item-axis tables shard over 'model', user tables over 'data',
    small vectors replicate."""
    specs: Dict[str, P] = {}
    for name in params:
        base = name[:-3] if name.endswith("_ag") else name
        if base in ("W", "V", "b_prime"):
            specs[name] = P("model") if params[name].ndim == 1 else P("model", None)
        elif base in ("Wu", "Uu"):
            specs[name] = P("data", None)
        else:  # b and other small vectors
            specs[name] = P()
    return specs


def mf_param_specs(params: Dict) -> Dict[str, P]:
    """PartitionSpecs for the MF family: user tables over 'data', item
    tables over 'model'."""
    specs: Dict[str, P] = {}
    for name in params:
        base = name[:-3] if name.endswith("_ag") else name
        if base in ("iv", "ib", "q", "bi", "Q", "P"):
            specs[name] = P("model") if params[name].ndim == 1 else P("model", None)
        elif base in ("uv", "ub", "p", "bu", "x", "Wu"):
            specs[name] = P("data") if params[name].ndim == 1 else P("data", None)
        else:
            specs[name] = P()
    return specs


def batch_specs() -> Dict[str, P]:
    """User-minibatch arrays shard over 'data' on the batch axis."""
    return {
        "uids": P("data"),
        "items": P("data", None),
        "ratings": P("data", None),
        "mask": P("data", None),
        "lengths": P("data"),
        "weight": P("data"),
    }


def named(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def _fit_spec(mesh: Mesh, spec: P, shape) -> P:
    """Drop mesh axes a dimension cannot divide (replicate instead) — GSPMD
    requires divisibility; small/odd tables degrade gracefully."""
    out = []
    for d, ax in enumerate(spec):
        if ax is None:
            out.append(None)
        elif d < len(shape) and shape[d] % mesh.shape[ax] == 0:
            out.append(ax)
        else:
            out.append(None)
    return P(*out)


def shard_params(mesh: Mesh, params: Dict, specs: Dict[str, P]) -> Dict:
    return {
        k: jax.device_put(
            v, NamedSharding(mesh, _fit_spec(mesh, specs[k], v.shape))
        )
        for k, v in params.items()
    }
