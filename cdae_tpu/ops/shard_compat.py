"""shard_map compatibility shim.

jax >= 0.8 promotes shard_map out of experimental (jax.shard_map) and
renames ``check_rep`` to ``check_vma``; the experimental import now emits a
DeprecationWarning. Every shard_map call site in this package goes through
here so the repo tracks the API with one switch.
"""

from __future__ import annotations

import jax

if hasattr(jax, "shard_map"):

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=check_rep)

else:  # pragma: no cover — pre-0.8 jax
    from jax.experimental.shard_map import shard_map  # noqa: F401
