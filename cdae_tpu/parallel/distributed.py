"""Multi-host runtime initialization (SURVEY §2e "Distributed communication
backend" — the reference has NONE: single process, shared memory only,
src/base/parallel.hpp:4-7).

Thin wrapper over ``jax.distributed.initialize`` with environment-variable
defaults so the same training script works single-host and as one process
per host of a pod slice:

  CDAE_COORDINATOR   host:port of process 0 (default: none = single process)
  CDAE_NUM_PROCESSES total process count
  CDAE_PROCESS_ID    this process's rank

After initialization, `jax.devices()` spans every host's chips and the
meshes built by parallel/mesh.py automatically cover the full slice; XLA
emits ICI (intra-slice) / DCN (inter-slice) collectives from the same
shardings used single-host.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime; returns True if multi-process.

    No-ops (returns False) when no coordinator is configured — single-process
    runs need no setup.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "CDAE_COORDINATOR"
    )
    if not coordinator_address:
        return False
    if num_processes is None:
        num_processes = int(os.environ["CDAE_NUM_PROCESSES"])
    if process_id is None:
        process_id = int(os.environ["CDAE_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_primary() -> bool:
    """True on the process that should write checkpoints / logs."""
    return jax.process_index() == 0
