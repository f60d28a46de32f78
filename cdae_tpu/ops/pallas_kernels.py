"""Pallas TPU kernels for the hot compute paths (SURVEY §7 stage 7).

Every kernel has an XLA-equivalent reference path and is validated against it
in tests/test_pallas.py (interpret mode on CPU, compiled on TPU):

  decode_scores   — tiled full-catalog decoder matmul  z @ Wᵀ + b'
                    (the recommend-time hot loop, ref cdae.hpp:162-196),
                    MXU-tiled with fused bias add.
  adagrad_update  — fused dense AdaGrad accumulate-then-apply
                    (a += g²; p -= lr·g/(β+√a), ref cdae.hpp:230-236) in one
                    pass over HBM with in-place buffer donation (3 reads +
                    2 writes instead of XLA's worst-case extra temporaries).
  streaming_topk_scores — NOT a Pallas kernel: a lax.scan blockwise
                    decode+merge top-k that never materializes (B, I) scores;
                    the memory-bounded path for Netflix/1M-item catalogs
                    (SURVEY §5 "blockwise accumulation").
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ------------------------------------------------------------- decode -------

def _decode_kernel(z_ref, w_ref, bp_ref, out_ref):
    # z: (TB, D), w: (TI, D), bp: (1, TI) -> out: (TB, TI)
    out_ref[:] = (
        jax.lax.dot_general(
            z_ref[:], w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bp_ref[:]
    )


@functools.partial(jax.jit, static_argnames=("tile_b", "tile_i"))
def decode_scores(
    z: jnp.ndarray,  # (B, D)
    W: jnp.ndarray,  # (I, D) decoder table (W or V)
    b_prime: jnp.ndarray,  # (I,)
    tile_b: int = 128,
    tile_i: int = 512,
) -> jnp.ndarray:
    """(B, I) decoder scores via a Pallas MXU kernel with fused bias."""
    B, D = z.shape
    I = W.shape[0]
    Bp, Ip = _round_up(B, tile_b), _round_up(I, tile_i)
    Dp = _round_up(D, 128)
    zp = jnp.pad(z, ((0, Bp - B), (0, Dp - D)))
    Wp = jnp.pad(W, ((0, Ip - I), (0, Dp - D)))
    bpp = jnp.pad(b_prime, (0, Ip - I)).reshape(1, Ip)
    grid = (Bp // tile_b, Ip // tile_i)
    out = pl.pallas_call(
        _decode_kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, Ip), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_b, Dp), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_i, Dp), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_i), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_b, tile_i), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Ip * Dp,
            bytes_accessed=(Bp * Dp + Ip * Dp + Bp * Ip) * 4,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(zp, Wp, bpp)
    return out[:B, :I]


# ------------------------------------------------------------- adagrad ------

def _adagrad_kernel(lr_ref, beta_ref, p_ref, a_ref, g_ref,
                    p_out_ref, a_out_ref):
    g = g_ref[:]
    a = a_ref[:] + g * g
    a_out_ref[:] = a
    p_out_ref[:] = p_ref[:] - lr_ref[0, 0] * g / (
        beta_ref[0, 0] + jnp.sqrt(a)
    )


@functools.partial(jax.jit, static_argnames=("tile",), donate_argnums=(0, 1))
def adagrad_update(
    param: jnp.ndarray,  # (N, D)
    acc: jnp.ndarray,  # (N, D)
    grad: jnp.ndarray,  # (N, D)
    lr: float,
    beta: float = 0.0,
    tile: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused AdaGrad step; donates param/acc buffers (in-place on TPU)."""
    orig_shape = param.shape
    if param.ndim == 1:
        param = param[:, None]
        acc = acc[:, None]
        grad = grad[:, None]
    N, D = param.shape
    Np, Dp = _round_up(N, tile), _round_up(D, 128)
    pp = jnp.pad(param, ((0, Np - N), (0, Dp - D)))
    ap = jnp.pad(acc, ((0, Np - N), (0, Dp - D)))
    gp = jnp.pad(grad, ((0, Np - N), (0, Dp - D)))
    lr_s = jnp.full((1, 1), lr, jnp.float32)
    beta_s = jnp.full((1, 1), beta, jnp.float32)
    p_new, a_new = pl.pallas_call(
        _adagrad_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Np, Dp), param.dtype),
            jax.ShapeDtypeStruct((Np, Dp), acc.dtype),
        ),
        grid_spec=pl.GridSpec(
            grid=(Np // tile,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, Dp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, Dp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, Dp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tile, Dp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, Dp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        input_output_aliases={2: 0, 3: 1},  # param->p_out, acc->a_out
        interpret=_use_interpret(),
    )(lr_s, beta_s, pp, ap, gp)
    p_new = p_new[:N, :D].reshape(orig_shape)
    a_new = a_new[:N, :D].reshape(orig_shape)
    return p_new, a_new


# ----------------------------------------------------- hardware RNG ---------

def _uniform_kernel(seed_ref, out_ref):
    # two-word seed (base, block): seeding with base+block aliases adjacent
    # calls' streams (seed s block 1 == seed s+1 block 0 — observed)
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.prng_random_bits(out_ref.shape)
    # low 24 bits via mask -> [0, 1): a plain >> 8 on the (signed-typed)
    # bits does an arithmetic shift and yields [-0.5, 0.5) — observed
    u24 = jax.lax.bitwise_and(bits, jnp.int32((1 << 24) - 1))
    out_ref[:] = u24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


@functools.partial(jax.jit, static_argnames=("shape", "rows_per_block"))
def hw_uniform(
    seed: jnp.ndarray,  # () or (1,) int32 — derive from key data
    shape: Tuple[int, int],
    rows_per_block: int = 256,
) -> jnp.ndarray:
    """(rows, cols) uniforms in [0,1) from the TPU hardware PRNG — ~an order
    of magnitude cheaper than threefry for big dropout/corruption masks
    (jax.random.uniform was 60% of the dense train step). Deterministic per
    (seed, shape)."""
    rows, cols = shape
    cols_p = _round_up(cols, 128)
    # bound the (rb, cols_p) f32 output block to ~4 MB so wide draws
    # (e.g. (B, 20k) negative masks) fit scoped VMEM with double buffering
    rb_cap = max(8, (4 * 1024 * 1024 // 4) // cols_p)
    rb = min(rows_per_block, rows, rb_cap)
    if rb < rows:  # partial blocks must be sublane-aligned (8)
        rb = max(8, rb // 8 * 8)
    rows_p = _round_up(rows, rb)
    out = pl.pallas_call(
        _uniform_kernel,
        out_shape=jax.ShapeDtypeStruct((rows_p, cols_p), jnp.float32),
        grid=(rows_p // rb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rb, cols_p), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
    )(jnp.asarray(seed, jnp.int32).reshape(1))
    return out[:rows, :cols]


# --------------------------------------------- fused decode+top-k (Pallas) --

def _mask_rated_scores(scores, r_ref, B: int, block: int, csr_w: int):
    """NEG-out rated columns of a (B, block) score tile.

    csr_w == 0: dense mode — r_ref is a streamed (B, block) int8 tile of
    the rated mask (int8 compare unsupported on this Mosaic target —
    widen first).

    csr_w > 0: CSR mode — r_ref is a (B, csr_w) int32 tile of LOCAL
    column ids rated in this block (-1 = empty slot), built by
    csr_block_queries. csr_w static compare+select passes over the tile;
    per the Mosaic notes the per-slot column is taken by slicing the
    loaded VALUE (ref slices hang the remote compiler)."""
    NEG = jnp.float32(-3.0e38)
    if csr_w == 0:
        return jnp.where(r_ref[:].astype(jnp.float32) > 0.0, NEG, scores)
    # streamed as a (1, B, csr_w) leading-axis block; drop the unit dim
    q = r_ref[:].reshape(B, csr_w)  # int32 local cols, -1 = none
    colsb = jax.lax.broadcasted_iota(jnp.int32, (B, block), 1)
    for t in range(csr_w):
        qt = jax.lax.slice(q, (0, t), (B, t + 1))  # (B, 1)
        scores = jnp.where(colsb == qt, NEG, scores)
    return scores


def _fused_topk_kernel(z_ref, w_ref, bp_ref, r_ref, ids_ref, vals_ref,
                       pool_vals, pool_ids, *, k: int, block: int,
                       csr_w: int = 0):
    """One catalog block: decode scores on the MXU, mask rated, merge into
    the VMEM-resident running top-k via k max-extract rounds (no sort —
    Mosaic-friendly).

    NOTE a "stream a larger tile, merge in sub-slices" variant (to amortize
    the ~16 µs fixed per-grid-step cost) was attempted round 4 and is NOT
    expressible on this Mosaic target: static slices of kernel refs hang
    the remote compiler; slicing loaded VALUES trips "Invalid input
    layout" on the post-slice broadcast and then a compiler assertion
    (limits[i] <= dim(i)) — see BASELINE.md. In-kernel jax.lax.top_k
    (which would replace the k extraction rounds with one pass) is an
    Unimplemented Mosaic primitive (probed round 5)."""
    j = pl.program_id(0)
    B = z_ref.shape[0]
    NEG = jnp.float32(-3.0e38)

    # pool layout: [0:k] running top-k, [k:k+block] this block's scores
    @pl.when(j == 0)
    def _():
        pool_vals[:, 0:k] = jnp.full((B, k), NEG, jnp.float32)
        pool_ids[:, 0:k] = jnp.zeros((B, k), jnp.int32)

    scores = jax.lax.dot_general(
        z_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[:]
    scores = _mask_rated_scores(scores, r_ref, B, block, csr_w)
    pool_vals[:, k:] = scores
    pool_ids[:, k:] = j * block + jax.lax.broadcasted_iota(
        jnp.int32, (B, block), 1
    )

    pool = pool_vals[:]
    ids = pool_ids[:]
    cols = jax.lax.broadcasted_iota(jnp.int32, pool.shape, 1)
    cols_k = jax.lax.broadcasted_iota(jnp.int32, (B, k), 1)
    new_vals = jnp.full((B, k), NEG, jnp.float32)
    new_ids = jnp.zeros((B, k), jnp.int32)
    for t in range(k):  # k max-extract rounds (k is small and static)
        m = jnp.max(pool, axis=1)  # (B,)
        arg = jnp.argmax(pool, axis=1).astype(jnp.int32)  # first max
        hit = cols == arg[:, None]
        sel_id = jnp.sum(jnp.where(hit, ids, 0), axis=1)
        # one-hot writes (Mosaic has no value-scatter; t is static)
        slot = cols_k == t
        new_vals = jnp.where(slot, m[:, None], new_vals)
        new_ids = jnp.where(slot, sel_id[:, None], new_ids)
        pool = jnp.where(hit, NEG, pool)
    pool_vals[:, 0:k] = new_vals
    pool_ids[:, 0:k] = new_ids

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        vals_ref[:] = new_vals
        ids_ref[:] = new_ids


def _fused_topk_kernel_grouped(z_ref, w_ref, bp_ref, r_ref, ids_ref,
                               vals_ref, run_vals, run_ids, *, k: int,
                               block: int, csr_w: int = 0):
    """Grouped-merge variant: ~2 VPU passes per extraction round instead of
    the plain kernel's ~5 (max+argmax+consume over the whole pool).

    Scores live grouped as (B, G, 128); a (B, G) group-maxima table makes
    each round's argmax tiny (k+G candidates). Extracting the winning
    element then touches (B, G, 128) twice (masked-max gather + clear);
    the group's max is repaired from the gathered 128 lanes, not by a full
    re-reduction. Also drops the (B, k+block) pool scratch entirely — the
    only scratch is the running (B, k) top-k."""
    j = pl.program_id(0)
    B = z_ref.shape[0]
    G = block // 128
    NEG = jnp.float32(-3.0e38)

    @pl.when(j == 0)
    def _():
        run_vals[:] = jnp.full((B, k), NEG, jnp.float32)
        run_ids[:] = jnp.zeros((B, k), jnp.int32)

    scores = jax.lax.dot_general(
        z_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[:]
    scores = _mask_rated_scores(scores, r_ref, B, block, csr_w)
    # group maxima via a minor-axis (lane) reduction — the only 3D op
    gm = jnp.max(scores.reshape(B, G, 128), axis=2)  # (B, G)

    rv = run_vals[:]
    rid = run_ids[:]
    cols_k = jax.lax.broadcasted_iota(jnp.int32, (B, k), 1)
    cols_g = jax.lax.broadcasted_iota(jnp.int32, (B, G), 1)
    cols_c = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    colsb = jax.lax.broadcasted_iota(jnp.int32, (B, block), 1)
    colsdiv = colsb // 128  # group of each column
    colsmod = colsb % 128  # lane within the group
    new_vals = jnp.full((B, k), NEG, jnp.float32)
    new_ids = jnp.zeros((B, k), jnp.int32)
    # NOTE every [:, None] rank-expansion below is on int32/f32 — Mosaic
    # cannot insert a minor dim on bool (i1) vectors.
    for t in range(k):  # k static rounds
        cand = jnp.concatenate([rv, gm], axis=1)  # (B, k+G)
        m = jnp.max(cand, axis=1)  # (B,)
        a = jnp.argmax(cand, axis=1).astype(jnp.int32)  # first max
        fr = (a < k).astype(jnp.int32)  # winner is a running entry
        oh_run = (cols_k == a[:, None]) & (fr[:, None] > 0)
        sel_run_id = jnp.sum(jnp.where(oh_run, rid, 0), axis=1)
        g = jnp.where(fr > 0, 0, a - k)  # (B,)
        ge = colsdiv == g[:, None]  # (B, block) winning-group columns
        # pass 1: gather the winning group's 128 lanes — 2D mask, then a
        # middle-axis max over the (B, G, 128) view (exactly one group per
        # row is non-NEG). NOTE: the f32 MXU alternative (selection-by-sum
        # against a tiled identity) is NOT exact on TPU at default
        # precision — the dot truncates to bf16 (measured 7.7e-3 error).
        masked = jnp.where(ge, scores, NEG)
        ext = jnp.max(masked.reshape(B, G, 128), axis=1)  # (B, 128)
        c = jnp.argmax(ext, axis=1).astype(jnp.int32)
        sel_id = jnp.where(
            fr > 0, sel_run_id, j * block + g * 128 + c
        )
        # pass 2: clear the consumed element in the block scores
        scores = jnp.where(
            ge & (colsmod == c[:, None]) & (fr[:, None] == 0),
            NEG, scores,
        )
        # repair that group's max from the gathered lanes (no re-reduce)
        nm = jnp.max(
            jnp.where(cols_c == c[:, None], NEG, ext), axis=1
        )
        gm = jnp.where((cols_g == g[:, None]) & (fr[:, None] == 0),
                       nm[:, None], gm)
        # consume the running entry (if the winner came from there)
        rv = jnp.where(oh_run, NEG, rv)
        slot = cols_k == t
        new_vals = jnp.where(slot, m[:, None], new_vals)
        new_ids = jnp.where(slot, sel_id[:, None], new_ids)
    run_vals[:] = new_vals
    run_ids[:] = new_ids

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        vals_ref[:] = new_vals
        ids_ref[:] = new_ids


def _fused_topk_block(B: int, block: int, k: int,
                      merge: str = "argmax", csr_w: int = 0) -> int:
    """Largest catalog block <= ``block`` whose kernel VMEM frame fits the
    scoped stack. Frame model (bytes) for the argmax merge: pool scratch
    8·B·(k+block) (f32 vals + i32 ids) + double-buffered streamed tiles:
    W (2·4·128·block) and the rated-exclusion input — the int8 mask tile
    (2·B·block) in dense mode, or the compact (B, csr_w) int32 query tile
    (2·4·B·csr_w, tiny) in CSR mode, which frees budget for a LARGER
    block (fewer grid steps — the ~16 µs/step fixed cost was ~7.7 ms of
    the 1M-item kernel at block 2048). Measured feasibility at a 1M-item
    catalog (round 4): (B=256, blk=2048) and (512, 1024) compile; (256,
    4096), (512, 2048) and (1024, 1024) hit the 16 MB scoped-vmem limit —
    an 8 MB frame budget separates the two sets with margin. The grouped
    merge has no (B, k+block) pool — its frame is the f32 scores value
    (4·B·block) + the same streamed tiles."""
    budget = 8 * 2**20
    b = max(B, 1)
    # Empirical B·block feasibility frontier (the byte model alone
    # under-predicts: the argmax kernel also holds full pool VALUE copies
    # + the scores value + masking iotas — measured (512, 1536) csr OOMs
    # at 18.51M scoped while (256, 2560) and (512, 1280) compile and run;
    # (256, 3200) fails; (512, 1280) and (1024, 640) fail with FEWER
    # cells — the frontier is not monotone in bytes, so the fused-csr
    # caller chunks batches to <= _CSR_CHUNK_B rows and this cap is only
    # exercised at B <= 256, where (256, 2560) is the validated optimum.
    cell_cap = 656_000
    blk = 128  # lane-tile floor; huge B degrades rather than OOMs
    while True:
        nxt = blk + 128
        rated = 8 * b * csr_w if csr_w else 2 * b * nxt
        if merge == "grouped":
            # ~3 live (B, block) f32 values per round (scores + masked
            # gather + repair temp): measured scoped frame 16.17M at
            # (B=256, blk=3968, csr) — 12·b·blk + W tiles + 172K over the
            # 16M limit; the old 4·b·blk model OOM'd there (round 5)
            frame = 12 * b * nxt + 1024 * nxt + rated
        else:
            frame = 8 * b * (k + nxt) + 1024 * nxt + rated
        if frame > budget or b * nxt > cell_cap or nxt > block:
            break
        blk = nxt
    return min(block, blk)


@functools.partial(
    jax.jit, static_argnames=("num_items", "block", "w")
)
def csr_block_queries(
    rated_items: jnp.ndarray,  # (B, L) int32, sorted asc, pad >= num_items
    num_items: int,
    block: int,
    w: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact per-(row, catalog-block) rated-column lists for the CSR
    fused top-k: (B, nblk·w) int32 of LOCAL column ids (-1 = empty slot),
    plus an overflow flag (some (row, block) holds > w rated entries — the
    caller must fall back to an exact path for this batch).

    Rows are sorted, so each block's entries are a contiguous span:
    span starts come from one vmapped binary search against the uniform
    block boundaries, then a take_along_axis spread into the (nblk, w)
    layout. NOTE (measured, round 5, B=256/L=1024/1M items): on TPU this
    in-jit build costs ~105 ms — the vmapped searchsorted is ~52 ms
    (method='sort' 13 ms) and the take_along_axis gather ~100 ms; a
    scatter-based build is ~13 ms. ALL of them lose to building qd ON THE
    HOST once per cached eval batch (csr_block_queries_np, ~1 ms numpy,
    amortized to zero across eval cadences) — serving paths should pass
    the precomputed ``qd`` into fused_topk_scores_csr and use this jit
    version only for one-shot/in-jit callers.
    """
    B, L = rated_items.shape
    nblk = -(-num_items // block)
    # pads (>= num_items) -> a sentinel past every block boundary so they
    # can never inflate the last block's count
    r = jnp.where(rated_items < num_items, rated_items,
                  jnp.int32(2_000_000_000))
    bounds = jnp.arange(nblk + 1, dtype=jnp.int32) * block
    starts = jax.vmap(
        lambda row: jnp.searchsorted(row, bounds, side="left",
                                     method="sort")
    )(r).astype(jnp.int32)  # (B, nblk+1) — method='sort': 13 vs 52 ms
    # at (256, 1024)x489 bounds (the scan method's binary-search
    # while_loop serializes on TPU; same finding as sample_unrated)
    cnt = starts[:, 1:] - starts[:, :-1]  # (B, nblk)
    overflow = jnp.any(cnt > w)
    wslots = jnp.arange(w, dtype=jnp.int32)
    l_idx = starts[:, :nblk, None] + wslots[None, None, :]  # (B, nblk, w)
    valid = wslots[None, None, :] < cnt[:, :, None]
    g = jnp.take_along_axis(
        r, jnp.clip(l_idx, 0, L - 1).reshape(B, nblk * w), axis=1
    ).reshape(B, nblk, w)
    local = g - bounds[:nblk][None, :, None]
    qd = jnp.where(valid, local, jnp.int32(-1))
    return qd.reshape(B, nblk * w), overflow


_CSR_CHUNK_B = 256  # fused-csr kernel row chunk (see fused_topk_scores_csr)


def fused_topk_csr_plan(B: int, k: int = 10, block: int = 4096,
                        merge: str = "argmax") -> int:
    """The catalog block fused_topk_scores_csr will actually use for these
    parameters — host qd builders MUST build with this block or the
    kernel's per-block query tiles won't line up. w-independent by
    construction (the clamp budgets the w cap); B-independent above the
    row chunk (large batches run as _CSR_CHUNK_B-row kernel calls)."""
    blk = _fused_topk_block(min(B, _CSR_CHUNK_B), block, k, merge, csr_w=64)
    if merge == "grouped":
        blk = _round_up(blk, 128)
    return blk


def csr_block_queries_np(
    rated_items: "np.ndarray",  # (B, L) int32, sorted asc, pad >= num_items
    num_items: int,
    block: int,
    w: Optional[int] = None,
    w_cap: int = 64,
):
    """Host (numpy) construction of the CSR fused top-k's per-block query
    lists — the serving path's builder: eval batches are cached across
    cadences, so this runs ONCE per batch and the device sees only the
    finished (B, nblk·w) array.

    ``w=None`` auto-sizes: w = max(8, pow2(max per-(row, block) count)),
    capped at ``w_cap`` — with realistic degree tails a FIXED w=8
    overflows almost every batch (B·nblk Poisson cells; one >8 count in
    ~100k cells is near-certain at 1M items/B=256 — measured round 5),
    while the true max is usually just 9-16; the kernel's masking cost is
    linear in w so paying only what the batch needs is strictly better
    than a large fixed w. Returns (qd (B, nblk·w), w, overflow); on
    overflow (max count > w) the caller must use an exact fallback path.
    """
    import numpy as np

    B, L = rated_items.shape
    nblk = -(-num_items // block)
    bounds = np.arange(nblk + 1, dtype=np.int64) * block
    rows, blks, ranks = [], [], []
    max_cnt = 0
    for b in range(B):
        row = rated_items[b]
        row = row[row < num_items]
        if len(row) == 0:
            rows.append(row)
            blks.append(row)
            ranks.append(row)
            continue
        starts = np.searchsorted(row, bounds)
        blk = row // block
        rank = np.arange(len(row)) - starts[blk]
        max_cnt = max(max_cnt, int(rank.max()) + 1)
        rows.append(row)
        blks.append(blk)
        ranks.append(rank)
    if w is None:
        w = max(8, 1 << (max(max_cnt, 1) - 1).bit_length())
        w = min(w, w_cap)
    overflow = max_cnt > w
    qd = np.full((B, nblk, w), -1, np.int32)
    for b in range(B):
        row, blk, rank = rows[b], blks[b], ranks[b]
        if len(row) == 0:
            continue
        if overflow:
            keep = rank < w
            blk, rank, row = blk[keep], rank[keep], row[keep]
        qd[b, blk, rank] = row - blk * block
    return qd.reshape(B, nblk * w), w, overflow


@functools.partial(jax.jit, static_argnames=("k", "block", "merge"))
def fused_topk_scores(
    z: jnp.ndarray,  # (B, D) hidden codes
    W: jnp.ndarray,  # (I, D) decoder table
    b_prime: jnp.ndarray,  # (I,)
    rated_rows: jnp.ndarray,  # (B, I) int8 — 1 at rated (dense_R[uids])
    k: int = 10,
    block: int = 2048,
    merge: str = "argmax",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-kernel streaming decode + top-k: blocks of the catalog are
    decoded on the MXU and merged into a VMEM-resident (B, k) running top-k
    — the fused version of streaming_topk_scores with no HBM score
    round-trips (SURVEY §7 stage 7 / north-star 'blockwise accumulation').
    ``block`` is clamped so the VMEM pool fits the scoped stack
    (_fused_topk_block) — large requested blocks degrade gracefully
    instead of failing to compile.

    ``merge``: 'argmax' = k max-extract rounds over the (B, k+block) pool;
    'grouped' = hierarchical group-maxima extraction (~2 passes/round
    instead of ~5, no pool scratch) — bitwise-identical results
    (tests/test_pallas.py).
    """
    B, D = z.shape
    block = _fused_topk_block(B, block, k, merge)
    if merge == "grouped":
        block = _round_up(block, 128)  # grouped view needs 128-lane groups
    I = W.shape[0]
    nblk = -(-I // block)
    Ip = nblk * block
    Dp = _round_up(D, 128)
    zp = jnp.pad(z.astype(jnp.float32), ((0, 0), (0, Dp - D)))
    Wp = jnp.pad(W.astype(jnp.float32), ((0, Ip - I), (0, Dp - D)))
    bpp = jnp.pad(b_prime.astype(jnp.float32), (0, Ip - I),
                  constant_values=-3.0e38).reshape(1, Ip)
    rp = jnp.pad(rated_rows.astype(jnp.int8), ((0, 0), (0, Ip - I)))
    if merge == "grouped":
        kernel = functools.partial(_fused_topk_kernel_grouped, k=k,
                                   block=block)
        scratch = [
            pltpu.VMEM((B, k), jnp.float32),
            pltpu.VMEM((B, k), jnp.int32),
        ]
    else:
        kernel = functools.partial(_fused_topk_kernel, k=k, block=block)
        scratch = [
            pltpu.VMEM((B, k + block), jnp.float32),
            pltpu.VMEM((B, k + block), jnp.int32),
        ]
    ids, vals = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, k), jnp.int32),
            jax.ShapeDtypeStruct((B, k), jnp.float32),
        ),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((B, Dp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, Dp), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, block), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Ip * Dp,
            bytes_accessed=(B * Dp + Ip * Dp + B * Ip) * 4,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(zp, Wp, bpp, rp)
    return ids, vals


@functools.partial(jax.jit,
                   static_argnames=("k", "block", "w", "merge", "fallback"))
def fused_topk_scores_csr(
    z: jnp.ndarray,  # (B, D) hidden codes
    W: jnp.ndarray,  # (I, D) decoder table
    b_prime: jnp.ndarray,  # (I,)
    rated_items: jnp.ndarray,  # (B, L) int32 sorted asc, padded with >= I
    k: int = 10,
    block: int = 4096,
    w: int = 8,
    merge: str = "argmax",
    fallback: str = "streaming",
    qd: Optional[jnp.ndarray] = None,  # precomputed (B, nblk·w) query
    # lists (csr_block_queries_np with THIS function's clamped block —
    # fused_topk_block_csr); skips the expensive in-jit build. The caller
    # owns overflow routing (host builder returns the flag).
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fused_topk_scores with the rated exclusion fused from the PADDED CSR
    ROWS — no (B, I) dense mask anywhere (ref behavior: cdae.hpp:176-186
    skips rated ids during the full-catalog scan).

    csr_block_queries turns the sorted rows into per-block compact local
    column lists (w slots per block); the kernel NEG-masks them in ``w``
    value-slice compare passes per tile. Freed VMEM (no streamed int8 mask
    tile) buys a bigger catalog block — fewer grid steps. Exactness for
    ANY w: if some (row, block) holds more than w rated entries, a
    lax.cond falls back to the XLA streaming scan for the whole batch
    (``fallback="streaming"``; "none" skips the guard — overflow rows may
    then recommend rated items, test-only).
    """
    B, D = z.shape
    # The kernel runs at B <= _CSR_CHUNK_B rows: its VMEM frame scales
    # with B·block and the Mosaic allocator's feasibility frontier is not
    # a clean byte model (measured: (256, 2560) runs, (512, 1280) and
    # (1024, 640) fail to compile with FEWER cells). Larger batches are
    # CHUNKED into 256-row kernel calls inside this same jit — one
    # program, sequential VMEM reuse, and every chunk keeps the validated
    # B=256 block (2560).
    CB = _CSR_CHUNK_B
    # clamp with the w CAP (64), not the actual w: the chosen block must
    # be identical for every w so host-built qd (fused_topk_csr_plan,
    # which runs before the batch's w is known) always lines up
    block = _fused_topk_block(min(B, CB), block, k, merge, csr_w=64)
    if merge == "grouped":
        block = _round_up(block, 128)  # grouped view needs 128-lane groups
    I = W.shape[0]
    nblk = -(-I // block)
    Ip = nblk * block
    Dp = _round_up(D, 128)
    zp = jnp.pad(z.astype(jnp.float32), ((0, 0), (0, Dp - D)))
    Wp = jnp.pad(W.astype(jnp.float32), ((0, Ip - I), (0, Dp - D)))
    bpp = jnp.pad(b_prime.astype(jnp.float32), (0, Ip - I),
                  constant_values=-3.0e38).reshape(1, Ip)
    if qd is None:
        qd, overflow = csr_block_queries(rated_items, I, block, w)
    else:
        overflow = None  # caller pre-routed overflow batches
        fallback = "none"
    # (nblk, B, w): leading grid-mapped axis — minor dims stay whole per
    # block (a (B, w) column-blocked layout would put a sub-128 block
    # boundary on the lane axis)
    qd3 = jnp.moveaxis(qd.reshape(B, nblk, w), 1, 0)

    def _call_kernel(zc, qc):
        Bc = zc.shape[0]
        if merge == "grouped":
            kernel = functools.partial(_fused_topk_kernel_grouped, k=k,
                                       block=block, csr_w=w)
            scratch = [
                pltpu.VMEM((Bc, k), jnp.float32),
                pltpu.VMEM((Bc, k), jnp.int32),
            ]
        else:
            kernel = functools.partial(_fused_topk_kernel, k=k, block=block,
                                       csr_w=w)
            scratch = [
                pltpu.VMEM((Bc, k + block), jnp.float32),
                pltpu.VMEM((Bc, k + block), jnp.int32),
            ]
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((Bc, k), jnp.int32),
                jax.ShapeDtypeStruct((Bc, k), jnp.float32),
            ),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((Bc, Dp), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, Dp), lambda j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bc, w), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((Bc, k), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Bc, k), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=scratch,
            cost_estimate=pl.CostEstimate(
                flops=2 * Bc * Ip * Dp,
                bytes_accessed=(Bc * Dp + Ip * Dp + Bc * nblk * w) * 4,
                transcendentals=0,
            ),
            interpret=_use_interpret(),
        )(zc, Wp, bpp, qc)

    def _fused(_):
        if B <= CB:
            return _call_kernel(zp, qd3)
        ids_c, vals_c = [], []
        for c0 in range(0, B, CB):
            c1 = min(c0 + CB, B)
            i, v = _call_kernel(zp[c0:c1], qd3[:, c0:c1, :])
            ids_c.append(i)
            vals_c.append(v)
        return (jnp.concatenate(ids_c, axis=0),
                jnp.concatenate(vals_c, axis=0))

    if fallback == "none":
        return _fused(None)

    def _stream(_):
        return streaming_topk_scores(z, W, b_prime, rated_items, k=k)

    return jax.lax.cond(overflow, _stream, _fused, None)


# ------------------------------------------------- streaming top-k (XLA) ----

@functools.partial(jax.jit, static_argnames=("k", "block"))
def streaming_topk_scores(
    z: jnp.ndarray,  # (B, D) hidden codes
    W: jnp.ndarray,  # (I, D) decoder table
    b_prime: jnp.ndarray,  # (I,)
    rated_items: jnp.ndarray,  # (B, L) sorted, padded with I
    k: int = 10,
    block: int = 16384,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k unrated items WITHOUT materializing (B, I) scores.

    Default block: 16384 measured 2.4x faster than 4096 at a 1M-item
    catalog (fewer scan steps / top_k merges; round 4) — the scan's
    working set stays O(B·block) either way.

    lax.scan over catalog blocks of ``block`` items: decode the block
    (MXU matmul), mask the user's rated items falling in the block
    (searchsorted on the sorted rated rows), and merge into the running
    (B, k) top-k. Peak memory O(B·(block + k)) — the scalable eval path for
    catalogs where B·I would blow HBM (BASELINE.json configs 4-5).
    """
    B, D = z.shape
    I = W.shape[0]
    nblk = -(-I // block)
    Ip = nblk * block
    Wp = jnp.pad(W, ((0, Ip - I), (0, 0)))
    bpp = jnp.pad(b_prime, (0, Ip - I), constant_values=-jnp.inf)

    def body(carry, blk_idx):
        run_vals, run_ids = carry
        start = blk_idx * block
        Wb = jax.lax.dynamic_slice(Wp, (start, 0), (block, D))
        bb = jax.lax.dynamic_slice(bpp, (start,), (block,))
        scores = z @ Wb.T + bb[None, :]  # (B, block)
        # mask rated ids that fall inside this block
        local = rated_items - start
        in_blk = (local >= 0) & (local < block)
        col = jnp.where(in_blk, local, block)
        b_idx = jnp.arange(B)[:, None]
        scores = scores.at[b_idx, col].set(-jnp.inf, mode="drop")
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (B, block), 1)
        cat_vals = jnp.concatenate([run_vals, scores], axis=1)
        cat_ids = jnp.concatenate([run_ids, ids], axis=1)
        vals, idx = jax.lax.top_k(cat_vals, k)
        return (vals, jnp.take_along_axis(cat_ids, idx, axis=1)), None

    init = (
        jnp.full((B, k), -jnp.inf, jnp.float32),
        jnp.full((B, k), I, jnp.int32),
    )
    (vals, ids), _ = jax.lax.scan(body, init, jnp.arange(nblk))
    return ids, vals


# --------------------------------------------- narrow-row gather on the MXU -

def _packed_gather_kernel(idx_ref, tbl_ref, out_ref, *, gsize: int,
                          block_q: int):
    """One (P_blk, 128) packed-row tile accumulated over Q blocks.

    tbl is the (N, D) table packed G rows per 128-lane row (D padded to
    128/G); the one-hot over the packed dimension q = idx//G is generated
    in VMEM (never HBM) and contracted on the MXU — same trick as
    scatter_matmul, transposed."""
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    q = idx_ref[:, 0] // gsize  # (P_blk,)
    qcol = jax.lax.broadcasted_iota(
        jnp.int32, (q.shape[0], block_q), 1
    ) + qi * block_q
    oh = (q[:, None] == qcol).astype(jnp.float32)
    out_ref[:] += jax.lax.dot_general(
        oh, tbl_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("block_p", "block_q"))
def gather_rows_mxu(
    table: jnp.ndarray,  # (N, D) f32, D small (narrow factor rows)
    idx: jnp.ndarray,  # (P,) int32; out-of-range rows come back zero
    block_p: int = 512,
    block_q: int = 512,
) -> jnp.ndarray:
    """(P, D) = table[idx] via MXU one-hot contraction over PACKED rows.

    TPU row gathers of narrow rows serialize (measured ~9 ns/row inside
    the pairwise fused epoch — 40% of the BPR step); packing G = 128//Dp
    consecutive rows per 128-lane group turns the gather into a
    (P, N/G) x (N/G, 128) matmul whose one-hot lives only in VMEM, then a
    G-way static-slice select that XLA fuses. Exact (f32 one-hot)."""
    N, D = table.shape
    Dp = 16 if D <= 16 else (32 if D <= 32 else 64 if D <= 64 else 128)
    G = 128 // Dp
    Np = _round_up(N, G * block_q)
    tbl = jnp.pad(table.astype(jnp.float32), ((0, Np - N), (0, Dp - D)))
    packed = tbl.reshape(Np // G, G * Dp)  # (Q, 128)
    P = idx.shape[0]
    Pp = _round_up(max(P, 1), block_p)
    idx_p = jnp.pad(idx.astype(jnp.int32), (0, Pp - P),
                    constant_values=jnp.int32(-1))[:, None]
    Q = Np // G
    grid = (Pp // block_p, Q // block_q)
    out = pl.pallas_call(
        functools.partial(_packed_gather_kernel, gsize=G, block_q=block_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_p, 1), lambda p, q: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 128), lambda p, q: (q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_p, 128), lambda p, q: (p, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pp, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Pp * Q * 128,
            bytes_accessed=Pp * (4 + 512) + Q * 512,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(idx_p, packed)
    # unpack: select the (idx % G)-th D-slice of each 128-lane packed row.
    # G static slices + masked sum — fused by XLA, no dynamic lane math.
    g = (idx.astype(jnp.int32) % G)[:, None]  # (P, 1)
    out = out[:P]
    res = jnp.zeros((P, D), jnp.float32)
    for gg in range(G):
        res = res + jnp.where(g == gg, out[:, gg * Dp: gg * Dp + D], 0.0)
    return res


# ------------------------------------- fused WARP violator count + select ---

def _warp_select_kernel(seed_ref, thr_ref, uv_ref, iv_ref, ib_ref, mask_ref,
                        nviol_ref, j_ref, bval_ref, bidx_ref,
                        *, nn: int, block_i: int, noise: str):
    """One (B_blk, block_i) tile of the WARP violator pipeline.

    Computes the score tile on the MXU, the violation mask in VMEM, and
    merges per-tile results into the running per-row (count, nn argmax
    selections) — the (B, I) score/violation/cumsum arrays of the XLA
    formulation never reach HBM. Selection is uniform over violators via
    the argmax-of-iid-noise identity: each (row, col, slot) gets an
    independent 24-bit value and slot k keeps the violator with the
    largest one (distribution-identical to the reference's uniform draw
    among violators, ref warp.hpp:63-88).

    noise: "hw" — TPU hardware PRNG, 1 op/elem (deterministic per
    (seed, slot, grid position), so selections depend on the tiling);
    "hash" — murmur-style mix of global (row, col, slot), ~9 ops/elem
    PER SLOT, tiling-invariant and available in interpret mode;
    "mshift" (default) — ONE murmur mix of global (row, col) shared by
    all slots, then a 2-op multiply-shift per slot (x·A_k >> 8, a
    universal hash family over the mixed base) — tiling-invariant like
    "hash" at ~nn·10 fewer VPU ops/elem (the selection passes were the
    measured bulk of the kernel: 2.0 of 3.79 ms/step at bs8192)."""
    ij = pl.program_id(1)
    bi = pl.program_id(0)
    B_blk = uv_ref.shape[0]
    C1 = jnp.int32(-1640531527)   # 0x9E3779B1
    C2 = jnp.int32(-2048144777)   # 0x85EBCA77 (wrapped)
    M1 = jnp.int32(-2048144789)   # 0x85EBCA6B
    M2 = jnp.int32(-1028477387)   # 0xC2B2AE35
    K1 = jnp.int32(-1028477379)   # 0xC2B2AE3D

    @pl.when(ij == 0)
    def _():
        nviol_ref[:] = jnp.zeros_like(nviol_ref)
        bval_ref[:] = jnp.full_like(bval_ref, -1.0)
        bidx_ref[:] = jnp.zeros_like(bidx_ref)

    scores = jax.lax.dot_general(
        uv_ref[:], iv_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + ib_ref[:]
    # int8 compare is unsupported on some Mosaic targets — widen first
    viol = (scores > thr_ref[:]) & (mask_ref[:].astype(jnp.float32) == 0.0)
    nviol_ref[:] += jnp.sum(viol.astype(jnp.int32), axis=1, keepdims=True)

    sr = jax.lax.shift_right_logical
    if noise in ("hash", "mshift"):
        cols = jax.lax.broadcasted_iota(jnp.int32, (B_blk, block_i), 1) + (
            ij * block_i
        )
        rows = jax.lax.broadcasted_iota(jnp.int32, (B_blk, block_i), 0) + (
            bi * B_blk
        )
    if noise == "mshift":
        base = seed_ref[0] + cols * C1 + rows * C2
        base = base ^ sr(base, 16)
        base = base * M1
        base = base ^ sr(base, 13)
        base = base * M2
        base = base ^ sr(base, 16)
        # second independent base: slot noise a_k·base + b_k·base2 is a
        # pairwise-independent family — kills the cross-slot correlation
        # a single shared base showed (pooled-slot chi2 350-411 vs dof
        # 255; with two bases it matches the full per-slot hash)
        base2 = (base ^ jnp.int32(-1640531527)) * M2
        base2 = base2 ^ sr(base2, 15)
        base2 = base2 * M1
        base2 = base2 ^ sr(base2, 17)
    cols_k = jax.lax.broadcasted_iota(jnp.int32, bval_ref.shape, 1)
    for k in range(nn):  # static, small
        if noise == "hw":
            # prng_seed takes at most 2 words and combines them ~additively
            # (see _uniform_kernel) — spread (slot, grid pos) into one word
            # multiplicatively so distinct blocks land on distant streams
            comb = (jnp.int32(k) * C1 + bi * jnp.int32(97003) + ij
                    ) * jnp.int32(2654435761 - (1 << 32))
            pltpu.prng_seed(seed_ref[0], comb)
            x = pltpu.prng_random_bits((B_blk, block_i))
        elif noise == "mshift":
            # per-slot odd multipliers; high product bits are the
            # well-mixed ones (multiply-shift universal hashing)
            def _odd(c):
                v = c & 0xFFFFFFFF | 1
                return jnp.int32(v - (1 << 32) if v >= 1 << 31 else v)

            a_k = _odd(0x9E3779B1 * (2 * k + 1))
            b_k = _odd(0x85EBCA77 * (2 * k + 3))
            x = sr(base * a_k + base2 * b_k, 8)
        else:
            x = seed_ref[0] + cols * C1 + rows * C2 + jnp.int32(k) * K1
            x = x ^ sr(x, 16)
            x = x * M1
            x = x ^ sr(x, 13)
            x = x * M2
            x = x ^ sr(x, 16)
        # Mosaic argmax supports f32 only: low 24 bits -> exact f32
        # (same trick as hw_uniform); non-violators rank below everything
        u24 = jax.lax.bitwise_and(x, jnp.int32((1 << 24) - 1))
        masked = jnp.where(viol, u24.astype(jnp.float32), -1.0)
        m = jnp.max(masked, axis=1)  # (B_blk,)
        arg = jnp.argmax(masked, axis=1).astype(jnp.int32)
        idx_glob = ij * block_i + arg
        slot = cols_k == k
        take = slot & (m[:, None] > bval_ref[:])
        bval_ref[:] = jnp.where(take, m[:, None], bval_ref[:])
        bidx_ref[:] = jnp.where(take, idx_glob[:, None], bidx_ref[:])

    @pl.when(ij == pl.num_programs(1) - 1)
    def _():
        j_ref[:] = bidx_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("nn", "block_b", "block_i", "noise"))
def warp_violator_select(
    seed: jnp.ndarray,  # () or (1,) int32
    uv_u: jnp.ndarray,  # (B, D) user rows
    iv: jnp.ndarray,  # (I, D) item table
    ib: jnp.ndarray,  # (I,) item bias
    thr: jnp.ndarray,  # (B,) violation threshold (yui - margin)
    mask_rows: jnp.ndarray,  # (B, I) int8, nonzero = rated
    nn: int,
    block_b: int = 256,
    block_i: int = 1024,
    noise: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused WARP violator count + nn uniform violator selections.

    Returns (nviol (B,) int32, j (B, nn) int32). Replaces the XLA dense
    path's materialized (B, I) scores + violation mask + int32 cumsum +
    bisection rank-select (models/mf.py WARP._dense_path) with one kernel
    whose only HBM traffic is the inputs (~B·I bytes of int8 mask). Rows
    with nviol == 0 return j = 0 — callers zero-weight them via the
    `found` gate exactly as the XLA path does.

    noise: None = "hw" (hardware PRNG, 1 op/elem) on TPU, "hash"
    (tiling-invariant murmur mix) in interpret mode / tests."""
    B, D = uv_u.shape
    I = iv.shape[0]
    Bp = _round_up(B, block_b)
    Ipad = _round_up(I, block_i)
    Dp = _round_up(D, 128)
    uvp = jnp.pad(uv_u.astype(jnp.float32), ((0, Bp - B), (0, Dp - D)))
    ivp = jnp.pad(iv.astype(jnp.float32), ((0, Ipad - I), (0, Dp - D)))
    ibp = jnp.pad(ib.astype(jnp.float32), (0, Ipad - I)).reshape(1, Ipad)
    # padded rows: +inf threshold -> no violators; padded cols: mask 1
    thrp = jnp.pad(thr.astype(jnp.float32), (0, Bp - B),
                   constant_values=3.0e38).reshape(Bp, 1)
    maskp = jnp.pad(mask_rows.astype(jnp.int8), ((0, Bp - B), (0, Ipad - I)),
                    constant_values=jnp.int8(1))
    if noise is None:
        # "mshift": one murmur mix shared by all slots + 2-op multiply-
        # shift per slot — tiling-invariant like "hash" at a fraction of
        # the per-slot VPU cost. ("hw" measured NO end-to-end gain over
        # the hash — 16.9k vs 17.6k users/s at bs8192 — and its 2-word
        # prng_seed aliases nearby streams.)
        noise = "mshift"
    kernel = functools.partial(_warp_select_kernel, nn=nn, block_i=block_i,
                               noise=noise)
    grid = (Bp // block_b, Ipad // block_i)
    nviol, j = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_b, 1), lambda b, j: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Dp), lambda b, j: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_i, Dp), lambda b, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_i), lambda b, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, block_i), lambda b, j: (b, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, 1), lambda b, j: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda b, j: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, 128), jnp.float32),
            pltpu.VMEM((block_b, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Ipad * Dp + 20 * nn * Bp * Ipad,
            bytes_accessed=Bp * Ipad + (Bp + Ipad) * Dp * 4,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(jnp.asarray(seed, jnp.int32).reshape(1), thrp, uvp, ivp, ibp, maskp)
    return nviol[:B, 0], jnp.clip(j[:B, :nn], 0, I - 1)


# ------------------------------------------- scatter as one-hot MXU tiles ---

def _scatter_mm_kernel(idx_ref, vals_ref, out_ref, *, block_n: int):
    """One (block_n, D) output tile accumulating over P tiles.

    Generates the one-hot tile (block_p, block_n) IN VMEM from an iota
    compare — the (P, N) one-hot of the XLA formulation (ops/scatter.py
    matmul_scatter_add) never exists in HBM, which removes the HBM
    bandwidth wall measured at ~3.8 ms/batch for the pairwise models.
    bf16 operands (one-hot is exact in bf16), f32 accumulation.
    """
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    idx_tile = idx_ref[:, 0]  # (block_p,)
    n0 = pl.program_id(0) * block_n
    col = jax.lax.broadcasted_iota(
        jnp.int32, (idx_tile.shape[0], block_n), 1
    ) + n0
    # one-hot in the vals dtype: 0/1 are exact in bf16; a bf16 one-hot
    # against f32 vals would silently downcast the contributions (measured
    # 0.03 abs err) — match operand dtypes instead
    oh = (idx_tile[:, None] == col).astype(vals_ref.dtype)
    out_ref[:] += jax.lax.dot_general(
        oh, vals_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def scatter_matmul(
    idx: jnp.ndarray,
    vals: jnp.ndarray,
    num_rows: int,
    block_p: int = 1024,
    block_n: int = 512,
    vals_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """out[n] = Σ_{p: idx[p]==n} vals[p] on the MXU, one-hot tiles in VMEM.

    The TPU-native row-aggregation primitive behind the pairwise model
    family (BPR/WARP pair grads, ref bpr.hpp:72-106, warp.hpp:90-117):
    TPU scatters serialize per index and the XLA one-hot matmul pays
    (P, N)·f32 of HBM traffic; this kernel pays only vals + out traffic.

    idx: (P,) int32; entries outside [0, num_rows) contribute nothing.
    vals: (P,) or (P, D) f32. Returns (num_rows,[ D]) f32.
    vals_dtype: MXU operand type for vals (bf16 default: ~0.4% per-element
    rounding on gradient contributions — metric-parity validated; pass
    jnp.float32 for exact contributions at ~4x the MXU cost).
    """
    squeeze = vals.ndim == 1
    if squeeze:
        vals = vals[:, None]
    P, D = vals.shape
    Dp = _round_up(max(D, 1), 128)
    Pp = _round_up(max(P, 1), block_p)
    Np = _round_up(max(num_rows, 1), block_n)
    idx_p = jnp.pad(idx.astype(jnp.int32), (0, Pp - P),
                    constant_values=jnp.int32(-1))[:, None]
    vals_p = jnp.pad(vals, ((0, Pp - P), (0, Dp - D))).astype(vals_dtype)

    grid = (Np // block_n, Pp // block_p)
    out = pl.pallas_call(
        functools.partial(_scatter_mm_kernel, block_n=block_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_p, 1), lambda n, p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_p, Dp), lambda n, p: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, Dp), lambda n, p: (n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, Dp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Pp * Np * Dp,
            bytes_accessed=Pp * (4 + 2 * Dp) + Np * Dp * 4,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(idx_p, vals_p)
    out = out[:num_rows, :D]
    return out[:, 0] if squeeze else out
