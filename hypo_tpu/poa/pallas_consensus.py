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


@functools.lru_cache(maxsize=None)
def _build_kernel(N: int, P: int, TW: int, MAXBC: int):

    def kernel(pred_ref, predw_ref, cnt_ref, isend_ref, code_ref,
               sup_ref, meta_ref, codes_out, sups_out, len_out,
               scores, preds):
        for w in range(TW):
            nn = meta_ref[w, 0]
            rank0 = meta_ref[w, 1]          # rank of node id 0

            def relax_plain(r, bw, bpr, bsc):
                def slot(p, c):
                    bw, bpr, bsc = c
                    pr = pred_ref[w, r * P + p]
                    wt = predw_ref[w, r * P + p]
                    sc = scores[w, jnp.maximum(pr, 0)]
                    take = (pr >= 0) & ((bw < wt)
                                        | ((bw == wt) & (bsc <= sc)))
                    return (jnp.where(take, wt, bw),
                            jnp.where(take, pr, bpr),
                            jnp.where(take, sc, bsc))
                return jax.lax.fori_loop(0, cnt_ref[w, r], slot,
                                         (bw, bpr, bsc))

            def relax_banned(r, bw, bpr, bsc):
                def slot(p, c):
                    bw, bpr, bsc = c
                    pr = pred_ref[w, r * P + p]
                    wt = predw_ref[w, r * P + p]
                    sc = scores[w, jnp.maximum(pr, 0)]
                    take = ((pr >= 0) & (sc != -1)
                            & ((bw < wt) | ((bw == wt) & (bsc <= sc))))
                    return (jnp.where(take, wt, bw),
                            jnp.where(take, pr, bpr),
                            jnp.where(take, sc, bsc))
                return jax.lax.fori_loop(0, cnt_ref[w, r], slot,
                                         (bw, bpr, bsc))

            # -- first pass: relax in rank order, first max wins ----------
            def fp_body(r, carry):
                msc, mr = carry
                bw, bpr, bsc = relax_plain(
                    r, jnp.int32(-1), jnp.int32(-1), jnp.int32(NEG))
                score = jnp.where(bpr >= 0, bw + bsc, jnp.int32(-1))
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
                not_end = isend_ref[w, jnp.maximum(mr, 0)] == 0
                return (nn > 0) & not_end & (it < MAXBC)

            def bc_body(s):
                mr, it = s
                rank0bc = mr

                # ban other predecessors of every successor of rank0bc
                def ban_v(v, _):
                    def chk(p, sflag):
                        return sflag | (pred_ref[w, v * P + p]
                                        == rank0bc)
                    succ = jax.lax.fori_loop(0, cnt_ref[w, v], chk,
                                             False)

                    def ban_p(p, _):
                        pr = pred_ref[w, v * P + p]
                        prc = jnp.maximum(pr, 0)
                        do = succ & (pr != rank0bc) & (pr >= 0)
                        scores[w, prc] = jnp.where(do, jnp.int32(-1),
                                                   scores[w, prc])
                        return 0
                    jax.lax.fori_loop(0, cnt_ref[w, v], ban_p, 0)
                    return 0
                jax.lax.fori_loop(0, nn, ban_v, 0)

                # reset + re-relax the suffix; new max starts at node
                # id 0 with score threshold 0 (spoa graph.cpp:661)
                def bc_r(r, carry):
                    msc2, mr2 = carry
                    scores[w, r] = jnp.int32(-1)
                    preds[w, r] = jnp.int32(-1)
                    bw, bpr, bsc = relax_banned(
                        r, jnp.int32(-1), jnp.int32(-1), jnp.int32(NEG))
                    score = jnp.where(bpr >= 0, bw + bsc, jnp.int32(-1))
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
                codes_out[w, t] = code_ref[w, rc]
                sups_out[w, t] = sup_ref[w, rc]
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
    meta = jnp.stack([n_nodes.astype(jnp.int32),
                      rank0.astype(jnp.int32)], axis=1)
    grid = (B // TW,)
    smem2 = lambda c: pl.BlockSpec((TW, c), lambda i: (i, 0),  # noqa: E731
                                   memory_space=pltpu.SMEM)
    codes, sups, lens = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem2(N * P), smem2(N * P), smem2(N), smem2(N),
                  smem2(N), smem2(N), smem2(2)],
        out_specs=[smem2(N), smem2(N), smem2(1)],
        out_shape=[jax.ShapeDtypeStruct((B, N), jnp.int32),
                   jax.ShapeDtypeStruct((B, N), jnp.int32),
                   jax.ShapeDtypeStruct((B, 1), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((TW, N), jnp.int32),
                        pltpu.SMEM((TW, N), jnp.int32)],
        interpret=interpret,
    )(pred_ranks.reshape(B, N * P), pred_w_r.reshape(B, N * P),
      pred_cnt_r.astype(jnp.int32), is_end_r.astype(jnp.int32),
      node_code_r.astype(jnp.int32), node_sup_r.astype(jnp.int32),
      meta)
    return codes[:B0], sups[:B0], lens[:B0, 0]
