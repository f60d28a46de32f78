"""ShardedCDAE — the flagship model trained over a ('data','model') mesh,
drop-in compatible with Solver/Evaluation (SURVEY §7 stage 6, end-to-end).

Wraps the single-chip CDAE: identical math (the sharded step is bitwise-equal
to the single-device step, see tests/test_parallel.py), with parameters laid
out per parallel/mesh.cdae_param_specs and every minibatch placed sharded
over the 'data' axis. Scoring emits a (batch, items) matrix sharded over
BOTH axes; top-k for evaluation merges per-shard candidates
(parallel/topk.py) or lets XLA gather for the generic evaluator path.

Usage:
    mesh = make_mesh(n_model=2)          # after distributed.initialize()
    model = ShardedCDAE(CDAEConfig(...), mesh=mesh)
    Solver(model, max_iteration=50).train(train, test, ["TOPN"])
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cdae_tpu.data.dataset import Interactions
from cdae_tpu.models.base import RecsysModel
from cdae_tpu.models.cdae import CDAE, CDAEConfig, CDAEState
from cdae_tpu.parallel.mesh import make_mesh
from cdae_tpu.parallel.sharded import (
    make_sharded_scores,
    make_sharded_train_step,
    shard_cdae_state,
)


class ShardedCDAE(RecsysModel):
    name = "ShardedCDAE"

    def __init__(self, config: Optional[CDAEConfig] = None,
                 mesh: Optional[Mesh] = None, **kw):
        cfg = config if config is not None else CDAEConfig(**kw)
        # pallas decode is a single-device fast path; GSPMD needs plain XLA.
        # dense_mode (explicitly True) runs the item-sharded dense slabs;
        # default/None keeps the sparse formulation.
        cfg = dataclasses.replace(
            cfg, use_pallas=False,
            dense_mode=bool(cfg.dense_mode),
        )
        self.inner = CDAE(cfg)
        self.cfg = self.inner.cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self._step = None
        self._dense_step = None
        self._scores = None

    # ------------------------------------------------------------- reset ----
    def reset(self, data: Interactions, seed: int = 0) -> CDAEState:
        from cdae_tpu.parallel.sharded import make_sharded_dense_step

        state = self.inner.reset(data, seed)
        state.params = shard_cdae_state(self.mesh, state.params)
        self._step = make_sharded_train_step(self.inner, self.mesh,
                                             state.params)
        self._scores = make_sharded_scores(self.inner, self.mesh,
                                           state.params)
        self._dense_step = None  # cleared: dispatch must follow THIS state
        if "dense_R" in state.aux:
            state.aux["dense_R"] = jax.device_put(
                state.aux["dense_R"],
                NamedSharding(self.mesh, P("data", "model")),
            )
            self._dense_step = make_sharded_dense_step(
                self.inner, self.mesh, state.params
            )
        return state

    def _sharded_dense_batches(self, state: CDAEState):
        """Dense uid/weight rows pre-placed P('data') ONCE (not per step)."""
        if "sharded_dense_batches" not in state.aux:
            data_sh = NamedSharding(self.mesh, P(None, "data"))
            uid_mat, w_mat = self.inner._dense_batches(state)
            state.aux["sharded_dense_batches"] = (
                jax.device_put(uid_mat, data_sh),
                jax.device_put(w_mat, data_sh),
            )
        return state.aux["sharded_dense_batches"]

    def _device_batches(self, state: CDAEState):
        """Batches placed sharded over the 'data' mesh axis (cached)."""
        if "sharded_batches" not in state.aux:
            data_sh = NamedSharding(self.mesh, P("data"))
            row_sh = NamedSharding(self.mesh, P("data", None))
            out = []
            for b in self.inner._host_batches(state):
                out.append((
                    jax.device_put(b.uids, data_sh),
                    jax.device_put(b.items, row_sh),
                    jax.device_put(b.mask, row_sh),
                    jax.device_put(b.lengths, data_sh),
                    jax.device_put(b.weight, data_sh),
                ))
            state.aux["sharded_batches"] = out
        return state.aux["sharded_batches"]

    # ------------------------------------------------------------- train ----
    def train_one_iteration(self, state: CDAEState, rng_key) -> CDAEState:
        params = state.params
        if self._dense_step is not None and "dense_R" in state.aux:
            R = state.aux["dense_R"]
            uid_mat, w_mat = self._sharded_dense_batches(state)
            for j in range(uid_mat.shape[0]):
                uids_j, w_j = uid_mat[j], w_mat[j]
                for _ in range(self.cfg.num_corruptions):
                    rng_key, sub = jax.random.split(rng_key)
                    params = self._dense_step(params, R, uids_j, w_j, sub)
            state.params = params
            state.step += 1
            return state
        for uids, items, mask, lengths, weight in self._device_batches(state):
            for _ in range(self.cfg.num_corruptions):
                rng_key, sub = jax.random.split(rng_key)
                params = self._step(params, uids, items, mask, lengths,
                                    weight, sub)
        state.params = params
        state.step += 1
        return state

    # -------------------------------------------------------- loss / eval ---
    def data_loss(self, state: CDAEState) -> float:
        return self.inner.data_loss(state)

    def penalty_loss(self, state: CDAEState) -> float:
        return self.inner.penalty_loss(state)

    def batch_scores(self, state: CDAEState, uids, rated_items, rated_mask):
        data_sh = NamedSharding(self.mesh, P("data"))
        row_sh = NamedSharding(self.mesh, P("data", None))
        return self._scores(
            state.params,
            jax.device_put(np.asarray(uids), data_sh),
            jax.device_put(np.asarray(rated_items), row_sh),
            jax.device_put(np.asarray(rated_mask), row_sh),
        )

    def predict(self, state: CDAEState, users, items):
        return self.inner.predict(state, users, items)

    def user_representations(self, state: CDAEState):
        return self.inner.user_representations(state)


class ShardedIMF(RecsysModel):
    """IMF trained over the ('data','model') mesh in dense full-catalog
    mode — the MF-family counterpart of ShardedCDAE (ROADMAP r1 top Scale
    item; ref algorithm imf.hpp:71-115, reformulated as sharded (B, I)
    slabs whose matmuls partition over both axes, see
    parallel/sharded.make_sharded_mf_dense_step).

    Drop-in for Solver/Evaluation. Dense mode is mandatory: the sharded
    step IS the dense-slab step (single-chip sparse IMF remains the
    fallback for catalogs whose (U, I) slab cannot exist).
    """

    name = "ShardedIMF"

    def __init__(self, config=None, mesh: Optional[Mesh] = None, **kw):
        from cdae_tpu.models.mf import IMF, MFConfig

        cfg = config if config is not None else MFConfig(**kw)
        cfg = dataclasses.replace(cfg, dense_mode=True)
        self.inner = IMF(cfg)
        self.cfg = self.inner.cfg
        self.loss = self.inner.loss
        self.mesh = mesh if mesh is not None else make_mesh()
        self._dense_step = None
        self._scores = None

    def reset(self, data: Interactions, seed: int = 0):
        from cdae_tpu.models.mf import _mf_batch_scores
        from cdae_tpu.parallel.mesh import mf_param_specs, shard_params
        from cdae_tpu.parallel.sharded import make_sharded_mf_dense_step

        state = self.inner.reset(data, seed)
        if "dense_R" not in state.aux:
            raise ValueError(
                "ShardedIMF requires dense mode (U*I slab); use single-chip "
                "IMF for catalogs beyond the dense budget"
            )
        specs = mf_param_specs(state.params)
        state.params = shard_params(self.mesh, state.params, specs)
        state.aux["dense_R"] = jax.device_put(
            state.aux["dense_R"],
            NamedSharding(self.mesh, P("data", "model")),
        )
        self._dense_step = make_sharded_mf_dense_step(
            self.inner, self.mesh, state.params
        )
        self._scores = jax.jit(
            _mf_batch_scores,
            in_shardings=(
                {k: NamedSharding(self.mesh, s) for k, s in specs.items()},
                NamedSharding(self.mesh, P("data")),
            ),
            out_shardings=NamedSharding(self.mesh, P("data", "model")),
        )
        return state

    def _sharded_dense_batches(self, state):
        if "sharded_dense_batches" not in state.aux:
            sh = NamedSharding(self.mesh, P(None, "data"))
            uid_mat, w_mat = self.inner._dense_user_batches(state)
            state.aux["sharded_dense_batches"] = (
                jax.device_put(uid_mat, sh), jax.device_put(w_mat, sh),
            )
        return state.aux["sharded_dense_batches"]

    def train_one_iteration(self, state, rng_key):
        R = state.aux["dense_R"]
        ratings = state.aux.get("dense_ratings", R)
        uid_mat, w_mat = self._sharded_dense_batches(state)
        params = state.params
        for j in range(uid_mat.shape[0]):
            rng_key, sub = jax.random.split(rng_key)
            params = self._dense_step(
                params, R, ratings, uid_mat[j], w_mat[j], sub
            )
        state.params = params
        state.step += 1
        return state

    def data_loss(self, state) -> float:
        return self.inner.data_loss(state)

    def penalty_loss(self, state) -> float:
        return self.inner.penalty_loss(state)

    def batch_scores(self, state, uids, rated_items, rated_mask):
        return self._scores(
            state.params,
            jax.device_put(np.asarray(uids, dtype=np.int32),
                           NamedSharding(self.mesh, P("data"))),
        )

    def predict(self, state, users, items):
        return self.inner.predict(state, users, items)
