"""Pallas TPU kernel for the batched POA DP — tie-exact with
hypo_tpu.poa.jax_poa.poa_dp_batch.

Why it beats the XLA formulation (jax_poa._dp_one):

- H stays resident in VMEM for the whole row sweep ([N+2, TW, LP] i32
  per grid step, row-major so chain gathers and row stores are single
  contiguous slab copies); the XLA scan carries H through HBM and
  re-gathers predecessor rows from HBM every step.
- The match/mismatch profile is computed IN the kernel from the arm
  row and the node's code (one scalar SMEM read per (window, row)) —
  no [B, N, LP] profile tensor ever exists in HBM.
- The per-(window, pred) gather is a narrow VMEM copy at a scalar
  index read from SMEM, and it only runs for the row's REAL
  predecessor count (block max, from SMEM); pred slabs keep a NEG
  high-water invariant so almost no per-row re-filling happens, and a
  fully-unrolled fast path serves single-predecessor rows.  The common
  "chain" row (pred == previous rank for every window in the block,
  the overwhelmingly typical case for POA graphs of near-identical
  arms) collapses to ONE whole-block VMEM slab copy.
- The argmax over end rows runs inside the kernel as a running max of
  an encoded (masked score, N - r) integer — wide vector ops only, no
  per-row reductions, no H materialization to HBM at all.

Semantics replicated from the reference traceback priority
(sisd_alignment_engine.cpp:363-428) exactly as in jax_poa: bp codes
0..P-1 diag via pred p, P..2P-1 vertical via pred p, 2P horizontal;
max_row picks the first maximum among eligible rows (is_end for
NW/ROV, all valid rows for LOV).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NW, LOV, ROV = 0, 1, 2
NEG = -16384  # same sentinel as jax_poa.NEG16 -> identical cell values


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _build_kernel(N: int, L: int, P: int, TW: int, m: int, n: int,
                  g: int):
    assert N < 2048  # row index must fit the argmax encoding
    LP = _round_up(L + 2, 128)  # lane LP-1 is never a real arm base

    def kernel(pred_ref, code_ref, cnt_ref, elig_ref, meta_ref,
               armx_ref, atsel_ref, bp_ref, best_ref, H, Hp,
               bestv):
        jj = jax.lax.broadcasted_iota(jnp.int32, (TW, LP), 1)
        jjg = jj * g
        # H is laid out [N+2, TW, LP] so the common chain-gather and the
        # per-row store are single contiguous [TW, LP] slab copies
        H[0, :, :] = jnp.where(jj <= L, jjg, NEG)
        H[N + 1, :, :] = jnp.full((TW, LP), NEG, jnp.int32)
        rov = jnp.stack([meta_ref[w, 0] for w in range(TW)])  # [TW]
        nmax = meta_ref[0, 1]          # block-max graph size
        for w in range(1, TW):
            nmax = jnp.maximum(nmax, meta_ref[w, 1])
        atsel = atsel_ref[:, :]  # [TW, LP] 1 only at lane arm_len[w]
        bestv[:, :] = jnp.full((TW, LP), -(2 ** 30), jnp.int32)
        # pre-fill all pred slabs once; the row loop keeps the invariant
        # "slabs >= hi_water are NEG" (hi_water = this row's gather
        # width), so per-row neg-filling only has to cover slabs the
        # PREVIOUS rows dirtied — almost always zero slabs — instead of
        # all P - mp slabs every row.
        for p in range(P):
            Hp[p, :, :] = jnp.full((TW, LP), NEG, jnp.int32)

        def row_step(r, hi_water):
            # match/mismatch profile for this row: one vectorized
            # compare against the per-window node codes (scalar SMEM
            # reads broadcast to a [TW] vector)
            codev = jnp.stack([code_ref[w, r] for w in range(TW)])
            profv = jnp.where(armx_ref[:, :] == (codev + 8)[:, None],
                              jnp.int32(m), jnp.int32(n))
            # predecessor row gathers, bounded by the block's real
            # pred count; chain rows collapse to one slab copy
            mp = cnt_ref[0, r]
            chain = ((cnt_ref[0, r] == 1)
                     & (pred_ref[0, r * P] == r))
            for w in range(1, TW):
                mp = jnp.maximum(mp, cnt_ref[w, r])
                chain = chain & ((cnt_ref[w, r] == 1)
                                 & (pred_ref[w, r * P] == r))

            @pl.when(chain)
            def gather_chain():
                Hp[0, :, :] = H[r, :, :]

            @pl.when(jnp.logical_not(chain))
            def gather_slow():
                def one_pred(p, _):
                    for w in range(TW):
                        idx = pred_ref[w, r * P + p]
                        Hp[p, w, :] = H[idx, w, :]
                    return 0
                jax.lax.fori_loop(0, mp, one_pred, 0)
            first2 = jax.lax.broadcasted_iota(
                jnp.int32, (TW, LP), 1) == 0
            iotal = jax.lax.broadcasted_iota(jnp.int32, (TW, LP), 1)

            def scan_row(val):
                run = val - jjg
                step = 1
                while step < LP:
                    sh = pltpu.roll(run, step, 1)
                    run = jnp.maximum(run,
                                      jnp.where(iotal >= step, sh, NEG))
                    step *= 2
                return run + jjg

            # fast path: every window's row has ONE predecessor (the
            # overwhelmingly common case for POA graphs of near-identical
            # arms) — all slab-1..P-1 work vanishes, fully unrolled.
            # Slabs >= mp are never read here: per-window invalid pred
            # slots (p < mp but p >= cnt_w) point at the permanent NEG
            # row N+1, so no neg-fill is needed, and NEG rows can never
            # win a backpointer tie (reachable cell values are bounded
            # far above NEG+match).
            @pl.when(mp == 1)
            def single_pred():
                Hpp = Hp[0, :, :]
                shifted = pltpu.roll(Hpp, 1, 1)
                diag = jnp.where(first2, NEG, shifted) + profv
                vert = Hpp + g
                col0 = jnp.where(rov == 1, 0, Hpp[:, 0] + g)   # [TW]
                val = jnp.where(first2, col0[:, None],
                                jnp.maximum(diag, vert))
                row = scan_row(val)
                H[r + 1, :, :] = row
                bp = jnp.full((TW, LP), 2 * P, dtype=jnp.int32)
                bp = jnp.where(vert == row, P, bp)
                bp = jnp.where(diag == row, 0, bp)
                if P > 1:
                    bp0 = jnp.where(Hpp[:, 0] + g == col0, P + 0, P)
                else:
                    bp0 = jnp.full((TW,), P, dtype=jnp.int32)
                bp = jnp.where(first2, bp0[:, None], bp)
                bp_ref[:, r, :] = bp
                elig = jnp.stack([elig_ref[w, r] for w in range(TW)])
                masked = jnp.where(
                    atsel == 1,
                    jnp.where(elig[:, None] == 1, row, NEG), -(2 ** 18))
                bestv[:, :] = jnp.maximum(bestv[:, :],
                                          masked * 2048 + (N - r))

            @pl.when(mp > 1)
            def multi_pred():
                def neg_fill(p, _):
                    Hp[p, :, :] = jnp.full((TW, LP), NEG, jnp.int32)
                    return 0
                # only slabs dirtied by earlier rows need re-NEGing
                jax.lax.fori_loop(mp, hi_water, neg_fill, 0)
                Hpm = Hp[:, :, :]
                shifted = pltpu.roll(Hpm, 1, 2)
                first3 = jax.lax.broadcasted_iota(
                    jnp.int32, (P, TW, LP), 2) == 0
                diag = (jnp.where(first3, NEG, shifted)
                        + profv[None, :, :])
                vert = Hpm + g
                dv = jnp.maximum(diag, vert)
                tmp = dv[0]
                for p in range(1, P):
                    tmp = jnp.maximum(tmp, dv[p])
                c0 = Hpm[0, :, 0]
                for p in range(1, P):
                    c0 = jnp.maximum(c0, Hpm[p, :, 0])
                col0 = jnp.where(rov == 1, 0, c0 + g)  # [TW]
                val = jnp.where(first2, col0[:, None], tmp)
                row = scan_row(val)
                H[r + 1, :, :] = row
                # backpointers: priority diag p0.. < vert p0.. < horiz,
                # first hit wins (assign from lowest priority upward)
                bp = jnp.full((TW, LP), 2 * P, dtype=jnp.int32)
                for p in range(P - 1, -1, -1):
                    bp = jnp.where(vert[p] == row, P + p, bp)
                for p in range(P - 1, -1, -1):
                    bp = jnp.where(diag[p] == row, p, bp)
                if P > 1:
                    bp0 = jnp.full((TW,), P, dtype=jnp.int32)
                    for p in range(P - 1, -1, -1):
                        bp0 = jnp.where(Hpm[p, :, 0] + g == col0,
                                        P + p, bp0)
                else:
                    bp0 = jnp.full((TW,), P, dtype=jnp.int32)
                bp = jnp.where(first2, bp0[:, None], bp)
                bp_ref[:, r, :] = bp
                elig = jnp.stack([elig_ref[w, r] for w in range(TW)])
                masked = jnp.where(
                    atsel == 1,
                    jnp.where(elig[:, None] == 1, row, NEG), -(2 ** 18))
                bestv[:, :] = jnp.maximum(bestv[:, :],
                                          masked * 2048 + (N - r))
            # (the bestv update — the online first-argmax of masked
            # H[r+1, arm_len] encoded as (masked score, N - r) so a
            # plain running max reproduces jax_poa's argmax tie rule —
            # happens inside each branch above)
            return jnp.where(mp > 1, mp, hi_water)

        # rows beyond the block's largest graph would compute garbage no
        # window reads (invalid rows are ineligible for the argmax and
        # unreachable through pred gathers) — skip them: graphs are
        # typically far smaller than the class cap N, and in early arm
        # rounds they are tiny
        jax.lax.fori_loop(0, nmax, row_step, jnp.int32(1))
        best_ref[:, :] = bestv[:, :]

    return kernel, LP


@functools.lru_cache(maxsize=None)
def _build_run(N: int, L: int, P: int, m: int, n: int, g: int, TW: int,
               interpret: bool):
    kernel, LP = _build_kernel(N, L, P, TW, m, n, g)

    @jax.jit
    def run(node_code, pred_rows, pred_cnt, is_end, n_nodes, arm,
            arm_len, mode):
        B0 = node_code.shape[0]
        B = _round_up(max(B0, TW), TW)
        pad = B - B0

        def padb(x):
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths)

        node_code, pred_rows, pred_cnt, is_end, n_nodes, arm, arm_len, \
            mode = map(padb, (node_code, pred_rows, pred_cnt, is_end,
                              n_nodes, arm, arm_len, mode))
        # unused pred slots -> permanent NEG row N+1
        parange = jnp.arange(P, dtype=pred_cnt.dtype)
        pred = jnp.where(parange[None, None, :] < pred_cnt[:, :, None],
                         pred_rows, N + 1).astype(jnp.int32)
        # lane j of armx is arm[j-1] + 8 (lane 0 and pad lanes -1, so
        # they never match a node code)
        armx = jnp.pad(arm.astype(jnp.int32) + 8,
                       ((0, 0), (1, LP - 1 - arm.shape[1])),
                       constant_values=-1)
        # elig flag (valid row & mode rule), read per-row in the kernel
        valid = jnp.arange(N)[None, :] < n_nodes[:, None]
        elig = jnp.where((mode == LOV)[:, None], valid,
                         valid & is_end).astype(jnp.int32)    # [B, N]
        meta = jnp.stack([(mode == ROV).astype(jnp.int32),
                          n_nodes.astype(jnp.int32)], axis=1)  # [B, 2]
        atsel = (jnp.arange(LP)[None, :]
                 == arm_len[:, None]).astype(jnp.int32)       # [B, LP]

        grid = (B // TW,)
        bp, best = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TW, N * P), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TW, N), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TW, N), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TW, N), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TW, 2), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TW, LP), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TW, LP), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TW, N, LP), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TW, LP), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, N, LP), jnp.int32),
                jax.ShapeDtypeStruct((B, LP), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((N + 2, TW, LP), jnp.int32),
                pltpu.VMEM((P, TW, LP), jnp.int32),
                pltpu.VMEM((TW, LP), jnp.int32),
            ],
            # the long class's H scratch ([TW, N+2, LP] i32) exceeds the
            # default 16 MB scoped-vmem stack; v5e has 128 MB of VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(pred.reshape(B, N * P), node_code.astype(jnp.int32),
          pred_cnt.astype(jnp.int32), elig, meta, armx, atsel)
        # decode (masked score, N - r) running max -> first-argmax row
        bestenc = jnp.max(best, axis=1)                       # [B]
        max_row = (N - jnp.mod(bestenc, 2048) + 1).astype(jnp.int32)
        # match jax_poa convention: zeros row 0, crop lanes to L+1
        bp_full = jnp.concatenate(
            [jnp.zeros((B, 1, L + 1), jnp.int8),
             bp[:, :, :L + 1].astype(jnp.int8)], axis=1)
        return bp_full[:B0], max_row[:B0]

    return run


def poa_dp_batch_pallas(node_code, pred_rows, pred_cnt, is_end, n_nodes,
                        arm, arm_len, mode, *, N: int, L: int, P: int,
                        m: int, n: int, g: int, TW: int = 8,
                        interpret: bool = False):
    """Drop-in twin of jax_poa.poa_dp_batch: returns (bp int8
    [B, N+1, L+1], max_row int32 [B]).  B is padded to a TW multiple
    internally."""
    run = _build_run(N, L, P, m, n, g, TW, interpret)
    return run(node_code, pred_rows, pred_cnt, is_end, n_nodes, arm,
               arm_len, mode)
