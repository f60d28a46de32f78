"""Fused CDAE dense-step kernel (ops/cdae_fused.py) vs the XLA dense step.

Interpret mode on CPU (hash noise); the deterministic subset (corruption 0,
num_neg 0 — no randomness) must match the XLA step to float-accumulation
tolerance; the stochastic path is gated on training quality (its RNG stream
legitimately differs from the XLA step's)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cdae_tpu.data.dataset import Interactions
from cdae_tpu.models import cdae as M


def _setup(loss="SQUARE", **kw):
    rng = np.random.default_rng(0)
    U, I, D, B = 40, 70, 12, 16
    R = jnp.asarray((rng.random((U, I)) < 0.15).astype(np.int8))
    uids = jnp.asarray(rng.integers(0, U, B).astype(np.int32))
    w = jnp.asarray((rng.random(B) < 0.9).astype(np.float32))
    cfg = M.CDAEConfig(num_dim=D, loss=loss, learn_rate=0.1, lambda_=0.01,
                       batch_size=B, user_factor=True, **kw)
    model = M.CDAE(cfg)
    st = model.reset(Interactions.from_arrays(
        np.repeat(np.arange(U), 2).astype(np.int32),
        np.tile(np.arange(2), U).astype(np.int32),
        num_users=U, num_items=I), seed=0)
    params = {k: jnp.asarray(v) for k, v in st.params.items()}
    return cfg, model.loss, params, R, uids, w


@pytest.mark.parametrize(
    "loss,kw",
    [("SQUARE", {}), ("CE", {}), ("SQUARE", {"tanh": True}),
     ("SQUARE", {"linear": True})],
)
def test_fused_matches_xla_deterministic(loss, kw):
    """corruption 0 + num_neg 0 removes all randomness: the fused kernel
    and the XLA dense step compute the SAME update (accumulation-order
    tolerance only)."""
    cfg, loss_obj, params, R, uids, w = _setup(
        loss=loss, corruption_ratio=0.0, num_neg=0, **kw
    )
    key = jax.random.PRNGKey(3)
    p_xla = M._dense_train_step(
        dict(params), R, uids, w, key,
        cfg=dataclasses.replace(cfg, fused_step=False), loss=loss_obj,
    )
    p_fus = M._dense_train_step_fused(
        dict(params), R, uids, w, key, cfg=cfg, loss=loss_obj,
    )
    for k in p_xla:
        np.testing.assert_allclose(
            np.asarray(p_fus[k]), np.asarray(p_xla[k]),
            rtol=3e-4, atol=1e-6, err_msg=k,
        )


def test_fused_step_trains(movielens_path):
    """Full stochastic path (corruption + Bernoulli negatives regenerated
    in-kernel) trains CDAE to the same recall ballpark as the XLA dense
    step."""
    from cdae_tpu.data.dataset import movielens_line_parser
    from cdae_tpu.evaluation import Evaluation

    data = Interactions.from_text(movielens_path, movielens_line_parser)
    train, test = data.split_by_user(0.2, seed=20141119)
    res = {}
    for fused in (True, False):
        model = M.CDAE(M.CDAEConfig(
            num_dim=10, loss="SQUARE", corruption_ratio=0.5, scaled=True,
            num_neg=5, batch_size=16, dense_mode=True, fused_step=fused,
            use_pallas=False,
        ))
        st = model.reset(train, seed=1)
        key = jax.random.PRNGKey(1)
        for _ in range(15):
            key, sub = jax.random.split(key)
            st = model.train_one_iteration(st, sub)
        res[fused] = Evaluation.create("TOPN").evaluate(
            model, st, test, train
        )["R@10"]
    assert res[True] > 0.3, res
    assert abs(res[True] - res[False]) < 0.25, res


def test_fused_supported_surface():
    """Routing: unsupported variants must fall back to the XLA step."""
    base = dict(num_dim=8, loss="SQUARE")
    assert M._fused_step_supported(M.CDAEConfig(**base))
    assert not M._fused_step_supported(
        M.CDAEConfig(asymmetric=True, **base))
    assert not M._fused_step_supported(
        M.CDAEConfig(linear_function=True, **base))
    assert not M._fused_step_supported(
        M.CDAEConfig(compute_dtype=jnp.bfloat16, **base))
    # explicit off always wins
    assert not M._use_fused_step(
        M.CDAEConfig(fused_step=False, **base))


def test_fused_step_unsupported_config_warns():
    """fused_step=True on a config outside the kernel's support surface
    must WARN about the silent XLA fallback (ADVICE r3) — a wide-D
    experiment meant to measure the Pallas kernel would otherwise time
    the wrong path."""
    cfg = M.CDAEConfig(num_dim=8, loss="SQUARE", fused_step=True,
                       asymmetric=True)
    with pytest.warns(UserWarning, match="fused"):
        assert not M._use_fused_step(cfg)
    # supported config: no warning, kernel selected
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        assert M._use_fused_step(
            M.CDAEConfig(num_dim=8, loss="SQUARE", fused_step=True))
