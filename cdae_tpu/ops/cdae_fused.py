"""Fused CDAE dense-step Pallas kernel (SURVEY §7 stage 7, round 3).

The XLA dense step (models/cdae._dense_train_step) is HBM-slab-bound: XLA
does not fuse elementwise producers into dot operands on TPU, so every
(B, I) slab — corruption uniforms, kept, negative selection, w_mat, pred,
g — materializes in HBM (~14 slab reads+writes/step ≈ 320-450 MB at the
canonical bench shape; measured 0.465 ms/step ≈ the 819 GB/s roofline).

This kernel runs the WHOLE step — corrupt → encode → activate → negative-
sample → decode → loss grads → table grads → AdaGrad — in one pallas_call
whose only (B, I)-sized HBM traffic is reading the int8 interaction rows
(three passes). The random masks are REGENERATED per catalog tile from the
TPU hardware PRNG (deterministic per (seed, tile), 1 op/elem) instead of
being stored; the hidden state (h, z, hidden-grad) lives in full-B VMEM
scratch.

Grid layout: (3 phases, nI catalog tiles, nB batch tiles) — batch tiles
INNERMOST so per-catalog-tile output accumulation (d_W over the batch) hits
consecutive grid cells (the Pallas output-revisit rule).

  phase 0 (encode):   h[b] += kept(b,j) @ W(j) ; at the end z = act(h+bias)
  phase 1 (decode):   pred = z @ W(j)ᵀ + b' ; g = loss'(pred)·w_mat ;
                      hidden_grad[b] += g @ W(j) ; accumulate d_b'(j),
                      touches(j) over b
  phase 2 (grads):    regenerate kept/g ; d_W(j) += gᵀ@z + keptᵀ@(hg·dz·s)
                      (+ λ-terms) ; AdaGrad-apply W(j), b'(j) in-kernel

Scope (canonical config surface): tied decoder (asymmetric=False), no Uu
gate (linear_function=False); sigmoid/tanh/linear activations; any loss
whose gradient is jnp-expressible (SQUARE/CE/LOG/...). The XLA step stays
the fallback for the rest (models/cdae.py routes).

ref: src/model/recsys/cdae.hpp:198-358 (the per-touch update math this
reproduces; see _dense_train_step for the line-by-line mapping).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cdae_tpu.ops.losses import Loss


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _hash_uniform(seed, rows, cols, draw):
    """Tiling-invariant murmur-mix uniform in [0,1) of global (row, col)
    coordinates — the interpret-mode stand-in for the hw PRNG (identical
    across the three phases by construction)."""
    _C1 = jnp.int32(-1640531527)   # 0x9E3779B1
    _C2 = jnp.int32(-2048144777)   # 0x85EBCA77 (wrapped)
    _M1 = jnp.int32(-2048144789)   # 0x85EBCA6B
    _M2 = jnp.int32(-1028477387)   # 0xC2B2AE35
    sr = jax.lax.shift_right_logical
    x = seed + rows * _C1 + cols * _C2 + jnp.int32(draw) * _M2
    x = x ^ sr(x, 16)
    x = x * _M1
    x = x ^ sr(x, 13)
    x = x * _M2
    x = x ^ sr(x, 16)
    u24 = jax.lax.bitwise_and(x, jnp.int32((1 << 24) - 1))
    return u24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _kernel(seed_ref, wu_ref, pneg_ref, hbias_ref, r_ref, w_ref, wag_ref,
            bp_ref, bpag_ref,
            w_out, wag_out, bp_out, bpag_out, hg_out,
            hz, hga, dbp, tch,
            *, cfg_static, loss: Loss):
    (q, scale, lam, lr, beta, use_ada, act, num_items, tile_b, tile_i,
     noise) = cfg_static
    p = pl.program_id(0)
    j = pl.program_id(1)
    b = pl.program_id(2)
    nI = pl.num_programs(1)
    nB = pl.num_programs(2)
    Dp = w_ref.shape[1]
    f32 = jnp.float32

    # ---- regenerate this (b, j) tile's randomness (phase-invariant) ----
    wu = wu_ref[:]  # (tile_b, 1)
    rows01 = r_ref[:].astype(f32)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_b, tile_i), 1) + (
        j * tile_i
    )
    valid = (col < num_items).astype(f32)
    rows01 = rows01 * valid
    if noise == "hw":
        pltpu.prng_seed(seed_ref[0], b * jnp.int32(16384) + j)
        bits_c = pltpu.prng_random_bits((tile_b, tile_i))
        bits_n = pltpu.prng_random_bits((tile_b, tile_i))

        def _unif(bits):
            u24 = jax.lax.bitwise_and(bits, jnp.int32((1 << 24) - 1))
            return u24.astype(f32) * f32(1.0 / (1 << 24))

        u_c = _unif(bits_c)
        u_n = _unif(bits_n)
    else:
        row = jax.lax.broadcasted_iota(jnp.int32, (tile_b, tile_i), 0) + (
            b * tile_b
        )
        u_c = _hash_uniform(seed_ref[0], row, col, 0)
        u_n = _hash_uniform(seed_ref[0], row, col, 1)
    kept01 = rows01 * (u_c > q).astype(f32) if q > 0.0 else rows01
    kept = kept01 * wu
    rows = rows01 * wu

    bsl = pl.ds(b * tile_b, tile_b)
    jsl = pl.ds(j * tile_i, tile_i)

    # ---------------------------------------------------- phase 0: encode
    @pl.when(p == 0)
    def _():
        @pl.when(j == 0)
        def _():
            hz[bsl, :] = jnp.zeros((tile_b, Dp), f32)

        hz[bsl, :] += jax.lax.dot_general(
            kept, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    def _act_z():
        # exact clamps of models/cdae._activation (ref cdae.hpp:391-414)
        h = hz[bsl, :] * f32(scale) + hbias_ref[:]
        if act == "linear":
            return h
        if act == "tanh":
            t = jnp.tanh(h)
            return jnp.where(h > 9.0, 1.0, jnp.where(h < -9.0, -1.0, t))
        s = 1.0 / (1.0 + jnp.exp(-h))
        return jnp.where(h > 18.0, 1.0, jnp.where(h < -18.0, 0.0, s))

    # --------------------------------------- phase 1: decode + loss grads
    @pl.when((p == 1) & (j == 0))
    def _():
        # finalize this b-tile's hidden state once per phase-1 sweep
        hz[bsl, :] = _act_z()
        hga[bsl, :] = jnp.zeros((tile_b, Dp), f32)

    def _g_tile():
        z = hz[bsl, :]
        pred = jax.lax.dot_general(
            z, w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ) + bp_ref[:]
        neg_sel = (1.0 - rows01) * valid * (
            u_n < pneg_ref[:]
        ).astype(f32) * wu
        w_mat = rows + neg_sel
        # truth IS the 0/1 row — one gradient eval, bitwise equal to the
        # two-branch where (rows01 is exactly 0.0/1.0; see the XLA dense
        # step's note, models/cdae.py)
        g = loss.gradient(pred, rows01) * w_mat
        return g, w_mat

    @pl.when(p == 1)
    def _():
        g, w_mat = _g_tile()
        hga[bsl, :] += jax.lax.dot_general(
            g, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

        @pl.when(b == 0)
        def _():
            dbp[0, jsl] = jnp.zeros((tile_i,), f32)
            tch[0, jsl] = jnp.zeros((tile_i,), f32)

        dbp[0, jsl] += jnp.sum(g, axis=0)
        tch[0, jsl] += jnp.sum(w_mat, axis=0)

    # --------------------------------- phase 2: table grads + AdaGrad
    @pl.when((p == 2) & (j == 0))
    def _():
        # base = hidden_grad · act'(z) (scale folded into the matmul)
        z = hz[bsl, :]
        if act == "linear":
            dz = jnp.ones_like(z)
        elif act == "tanh":
            dz = 1.0 - z * z
        else:
            dz = z - z * z  # exact _z_one_minus_z form
        hga[bsl, :] = hga[bsl, :] * dz

    @pl.when(p == 2)
    def _():
        g, w_mat = _g_tile()
        z = hz[bsl, :]
        base = hga[bsl, :]
        contrib = jax.lax.dot_general(
            g, z, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + jax.lax.dot_general(
            kept, base, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) * f32(scale)

        @pl.when(b == 0)
        def _():
            w_out[:] = jnp.zeros_like(w_out)

        w_out[:] += contrib

        @pl.when(b == nB - 1)
        def _():
            d_w = w_out[:] + f32(lam) * tch[0, jsl][:, None] * w_ref[:]
            d_bp = dbp[0, jsl] + f32(lam) * tch[0, jsl] * bp_ref[0, :]
            if use_ada:
                ag_w = wag_ref[:] + d_w * d_w
                ag_bp = bpag_ref[0, :] + d_bp * d_bp
                w_out[:] = w_ref[:] - f32(lr) * d_w / (
                    f32(beta) + jnp.sqrt(ag_w)
                )
                bp_out[0, :] = bp_ref[0, :] - f32(lr) * d_bp / (
                    f32(beta) + jnp.sqrt(ag_bp)
                )
                wag_out[:] = ag_w
                bpag_out[0, :] = ag_bp
            else:
                w_out[:] = w_ref[:] - f32(lr) * d_w
                bp_out[0, :] = bp_ref[0, :] - f32(lr) * d_bp
                wag_out[:] = wag_ref[:]
                bpag_out[0, :] = bpag_ref[0, :]

        # hidden-grad output for the host-side b/Wu updates (post-dz,
        # pre-scale; written once per (j, b) — last write wins, idempotent)
        hg_out[:] = base


@functools.partial(
    jax.jit,
    static_argnames=("q", "scale", "lam", "lr", "beta", "use_ada", "act",
                     "loss_name", "tile_b", "tile_i", "noise"),
)
def cdae_dense_step_fused(
    seed: jnp.ndarray,  # () int32 — per-step seed
    rows_int8: jnp.ndarray,  # (B, I) int8 interaction rows (dense_R[uids])
    w_user: jnp.ndarray,  # (B,) 0/1 batch weights
    p_neg: jnp.ndarray,  # (B,) Bernoulli negative prob per user
    h_bias: jnp.ndarray,  # (B, D) b (+ Wu[uids]) hidden offsets
    W: jnp.ndarray,  # (I, D)
    W_ag: jnp.ndarray,  # (I, D) f32
    b_prime: jnp.ndarray,  # (I,)
    bp_ag: jnp.ndarray,  # (I,) f32
    *,
    q: float,
    scale: float,
    lam: float,
    lr: float,
    beta: float,
    use_ada: bool,
    act: str,  # "sigmoid" | "tanh" | "linear"
    loss_name: str,
    tile_b: int = 512,
    tile_i: int = 512,
    noise: str = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused CDAE dense step. Returns (W', W_ag', b_prime', bp_ag',
    hidden_grad·act') — the caller applies the small per-user updates
    (b, Wu) from the returned hidden grad exactly as the XLA step does."""
    loss = Loss.create(loss_name)
    B, I = rows_int8.shape
    D = W.shape[1]
    if noise is None:
        noise = "hash" if _use_interpret() else "hw"
    Bp = _round_up(B, tile_b)
    Ip = _round_up(I, tile_i)
    Dp = _round_up(D, 128)
    f32 = jnp.float32
    rp = jnp.pad(rows_int8, ((0, Bp - B), (0, Ip - I)))
    wu = jnp.pad(w_user.astype(f32), (0, Bp - B)).reshape(Bp, 1)
    pneg = jnp.pad(p_neg.astype(f32), (0, Bp - B)).reshape(Bp, 1)
    hb = jnp.pad(h_bias.astype(f32), ((0, Bp - B), (0, Dp - D)))
    Wp = jnp.pad(W.astype(f32), ((0, Ip - I), (0, Dp - D)))
    Wagp = jnp.pad(W_ag.astype(f32), ((0, Ip - I), (0, Dp - D)),
                   constant_values=1.0)
    bpp = jnp.pad(b_prime.astype(f32), (0, Ip - I)).reshape(1, Ip)
    bpagp = jnp.pad(bp_ag.astype(f32), (0, Ip - I),
                    constant_values=1.0).reshape(1, Ip)

    nB, nI = Bp // tile_b, Ip // tile_i
    cfg_static = (float(q), float(scale), float(lam), float(lr), float(beta),
                  bool(use_ada), act, int(I), tile_b, tile_i, noise)
    kernel = functools.partial(_kernel, cfg_static=cfg_static, loss=loss)
    grid = (3, nI, nB)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # seed
            pl.BlockSpec((tile_b, 1), lambda p, j, b: (b, 0),
                         memory_space=pltpu.VMEM),          # w_user
            pl.BlockSpec((tile_b, 1), lambda p, j, b: (b, 0),
                         memory_space=pltpu.VMEM),          # p_neg
            pl.BlockSpec((tile_b, Dp), lambda p, j, b: (b, 0),
                         memory_space=pltpu.VMEM),          # h_bias
            pl.BlockSpec((tile_b, tile_i), lambda p, j, b: (b, j),
                         memory_space=pltpu.VMEM),          # rows int8
            pl.BlockSpec((tile_i, Dp), lambda p, j, b: (j, 0),
                         memory_space=pltpu.VMEM),          # W
            pl.BlockSpec((tile_i, Dp), lambda p, j, b: (j, 0),
                         memory_space=pltpu.VMEM),          # W_ag
            pl.BlockSpec((1, tile_i), lambda p, j, b: (0, j),
                         memory_space=pltpu.VMEM),          # b_prime
            pl.BlockSpec((1, tile_i), lambda p, j, b: (0, j),
                         memory_space=pltpu.VMEM),          # bp_ag
        ],
        out_specs=(
            pl.BlockSpec((tile_i, Dp), lambda p, j, b: (j, 0),
                         memory_space=pltpu.VMEM),          # W'
            pl.BlockSpec((tile_i, Dp), lambda p, j, b: (j, 0),
                         memory_space=pltpu.VMEM),          # W_ag'
            pl.BlockSpec((1, tile_i), lambda p, j, b: (0, j),
                         memory_space=pltpu.VMEM),          # b_prime'
            pl.BlockSpec((1, tile_i), lambda p, j, b: (0, j),
                         memory_space=pltpu.VMEM),          # bp_ag'
            pl.BlockSpec((tile_b, Dp), lambda p, j, b: (b, 0),
                         memory_space=pltpu.VMEM),          # hidden grad
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Ip, Dp), f32),
            jax.ShapeDtypeStruct((Ip, Dp), f32),
            jax.ShapeDtypeStruct((1, Ip), f32),
            jax.ShapeDtypeStruct((1, Ip), f32),
            jax.ShapeDtypeStruct((Bp, Dp), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bp, Dp), f32),   # hz: h then z
            pltpu.VMEM((Bp, Dp), f32),   # hga: hidden-grad then ·dz
            pltpu.VMEM((1, Ip), f32),    # d_b' accumulator
            pltpu.VMEM((1, Ip), f32),    # touches accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * Bp * Ip * Dp,
            bytes_accessed=3 * Bp * Ip + 3 * Ip * Dp * 4 + Bp * Dp * 4,
            transcendentals=2 * Bp * Ip,
        ),
        compiler_params=pltpu.CompilerParams(
            # full-B hidden-state scratches + slab tiles exceed the 16 MB
            # default scoped-vmem budget at D >= 200 (v5e has headroom)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_use_interpret(),
    )(jnp.asarray(seed, jnp.int32).reshape(1), wu, pneg, hb, rp,
      Wp, Wagp, bpp, bpagp)
    w_new, wag_new, bp_new, bpag_new, hg = out
    return (
        w_new[:I, :D], wag_new[:I, :D], bp_new[0, :I], bpag_new[0, :I],
        hg[:B, :D],
    )
