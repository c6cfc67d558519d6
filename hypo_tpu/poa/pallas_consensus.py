"""Pallas TPU kernel for heaviest-bundle consensus (spoa semantics,
reference external/spoa/src/graph.cpp:610-705).

The consensus is an inherently sequential per-window computation: relax
nodes in topological order picking the in-edge with max (weight, pred
score), optionally re-relax suffixes during branch completion, then
backtrack.  On this TPU the XLA formulations lose badly — batched
gathers run at ~100M elem/s and data-parallel wavefront relaxation
needs longest-path-many full-array rounds — while the scalar core
executes the reference's own sequential loop shape at ~1 op/ns out of
SMEM.  So the kernel keeps every per-window array (scores, preds,
predecessor tables) in SMEM and runs the exact sequential algorithm,
TW windows per grid block; the vector units stay free for the DP
kernel's work.

SMEM is ~1 MB and input windows are double-buffered, so the per-node
tables are bit-packed into single i32 words (edge: weight << 11 |
rank+1; node: support << 8 | code << 5 | is_end << 4 | pred_cnt) —
without packing the N=1024 long-window class does not fit.

Tie rules replicated exactly (tested bit-identical against
hypo_tpu.poa.colpoa_ref.ColPoa.consensus):
- relax picks max (weight, then pred score), later slots win ties
  (graph.cpp:618-624);
- the first pass tracks the first maximum in rank order;
- branch completion bans alternative predecessors of the chosen node's
  successors, re-relaxes the suffix skipping scores == -1, starts the
  new max at node id 0 with score threshold 0 (graph.cpp:660-705).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2 ** 30)
RANK_BITS = 11          # rank+1 fits 11 bits for N <= 2047
RANK_MASK = (1 << RANK_BITS) - 1


@functools.lru_cache(maxsize=None)
def _build_kernel(N: int, P: int, TW: int, MAXBC: int):

    def kernel(pred_ref, node_ref, meta_ref, out_ref, len_out,
               scores, preds):
        for w in range(TW):
            nn = meta_ref[w, 0]
            rank0 = meta_ref[w, 1]          # rank of node id 0

            def relax(r, banned: bool):
                def slot(p, c):
                    bw, bpr, bsc = c
                    e = pred_ref[w, r * P + p]
                    pr = (e & RANK_MASK) - 1
                    wt = e >> RANK_BITS
                    sc = scores[w, jnp.maximum(pr, 0)]
                    ok = pr >= 0
                    if banned:
                        ok = ok & (sc != -1)
                    take = ok & ((bw < wt) | ((bw == wt) & (bsc <= sc)))
                    return (jnp.where(take, wt, bw),
                            jnp.where(take, pr, bpr),
                            jnp.where(take, sc, bsc))
                cnt = node_ref[w, r] & 15
                # slot 0 inline (almost every node has exactly one
                # in-edge; cnt >= 1 always — empty slots decode pr=-1)
                c0 = slot(0, (jnp.int32(-1), jnp.int32(-1),
                              jnp.int32(NEG)))
                bw, bpr, bsc = jax.lax.fori_loop(1, cnt, slot, c0)
                return jnp.where(bpr >= 0, bw + bsc, jnp.int32(-1)), bpr

            # -- first pass: relax in rank order, first max wins ----------
            def fp_body(r, carry):
                msc, mr = carry
                score, bpr = relax(r, banned=False)
                scores[w, r] = score
                preds[w, r] = bpr
                take = msc < score
                return (jnp.where(take, score, msc),
                        jnp.where(take, r, mr))

            msc, mr = jax.lax.fori_loop(
                0, nn, fp_body, (jnp.int32(NEG), jnp.int32(0)))

            # -- branch completion (graph.cpp:660-705) --------------------
            def bc_cond(s):
                mr, it = s
                not_end = ((node_ref[w, jnp.maximum(mr, 0)] >> 4) & 1
                           ) == 0
                return (nn > 0) & not_end & (it < MAXBC)

            def bc_body(s):
                mr, it = s
                rank0bc = mr

                # ban other predecessors of every successor of rank0bc
                def ban_v(v, _):
                    cnt = node_ref[w, v] & 15

                    def chk(p, sflag):
                        e = pred_ref[w, v * P + p]
                        return sflag | ((e & RANK_MASK) - 1 == rank0bc)
                    succ = jax.lax.fori_loop(0, cnt, chk, False)

                    def ban_p(p, _):
                        e = pred_ref[w, v * P + p]
                        pr = (e & RANK_MASK) - 1
                        prc = jnp.maximum(pr, 0)
                        do = succ & (pr != rank0bc) & (pr >= 0)
                        scores[w, prc] = jnp.where(do, jnp.int32(-1),
                                                   scores[w, prc])
                        return 0
                    jax.lax.fori_loop(0, cnt, ban_p, 0)
                    return 0
                jax.lax.fori_loop(0, nn, ban_v, 0)

                # reset + re-relax the suffix; new max starts at node
                # id 0 with score threshold 0 (spoa graph.cpp:661)
                def bc_r(r, carry):
                    msc2, mr2 = carry
                    scores[w, r] = jnp.int32(-1)
                    preds[w, r] = jnp.int32(-1)
                    score, bpr = relax(r, banned=True)
                    scores[w, r] = score
                    preds[w, r] = bpr
                    take = msc2 < score
                    return (jnp.where(take, score, msc2),
                            jnp.where(take, r, mr2))

                _msc2, mr2 = jax.lax.fori_loop(
                    rank0bc + 1, nn, bc_r, (jnp.int32(0), rank0))
                return mr2, it + 1

            mr, _it = jax.lax.while_loop(bc_cond, bc_body,
                                         (mr, jnp.int32(0)))

            # -- backtrack (emit backward; caller reverses) ---------------
            def bt_cond(s):
                r, t = s
                return (r >= 0) & (t < N)

            def bt_body(s):
                r, t = s
                rc = jnp.maximum(r, 0)
                out_ref[w, t] = node_ref[w, rc] >> 5  # sup<<3 | code
                return preds[w, rc], t + 1

            r0 = jnp.where(nn > 0, mr, jnp.int32(-1))
            _r, tlen = jax.lax.while_loop(bt_cond, bt_body,
                                          (r0, jnp.int32(0)))
            len_out[w, 0] = tlen

    return kernel


def heaviest_bundle_pallas(pred_ranks, pred_w_r, pred_cnt_r, is_end_r,
                           node_code_r, node_sup_r, n_nodes, rank0, *,
                           N: int, P: int, TW: int = 8,
                           interpret: bool = False):
    """Returns (codes_bwd [B, N], sups_bwd [B, N], cons_len [B]) — the
    consensus emitted BACKWARD (caller reverses).  All inputs are in
    rank space (from device_full._rank_arrays)."""
    kernel = _build_kernel(N, P, TW, N)
    B0 = pred_ranks.shape[0]
    B = ((max(B0, TW) + TW - 1) // TW) * TW
    pad = B - B0

    def padb(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    pred_ranks, pred_w_r, pred_cnt_r, is_end_r, node_code_r, \
        node_sup_r, n_nodes, rank0 = map(
            padb, (pred_ranks, pred_w_r, pred_cnt_r, is_end_r,
                   node_code_r, node_sup_r, n_nodes, rank0))
    # bit-packed tables (see module docstring)
    edges = jnp.where(pred_ranks >= 0,
                      (pred_w_r << RANK_BITS) | (pred_ranks + 1),
                      0).reshape(B, N * P).astype(jnp.int32)
    nodes = ((node_sup_r.astype(jnp.int32) << 8)
             | (node_code_r.astype(jnp.int32) << 5)
             | (is_end_r.astype(jnp.int32) << 4)
             | jnp.minimum(pred_cnt_r, 15).astype(jnp.int32))
    meta = jnp.stack([n_nodes.astype(jnp.int32),
                      rank0.astype(jnp.int32)], axis=1)
    grid = (B // TW,)
    smem2 = lambda c: pl.BlockSpec((TW, c), lambda i: (i, 0),  # noqa: E731
                                   memory_space=pltpu.SMEM)
    out, lens = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem2(N * P), smem2(N), smem2(2)],
        out_specs=[smem2(N), smem2(1)],
        out_shape=[jax.ShapeDtypeStruct((B, N), jnp.int32),
                   jax.ShapeDtypeStruct((B, 1), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((TW, N), jnp.int32),
                        pltpu.SMEM((TW, N), jnp.int32)],
        interpret=interpret,
    )(edges, nodes, meta)
    codes_bwd = out & 7
    sups_bwd = out >> 3
    return codes_bwd[:B0], sups_bwd[:B0], lens[:B0, 0]
