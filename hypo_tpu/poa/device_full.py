"""Fully on-device POA: the entire multi-arm partial-order-alignment of
a window — DP, traceback, graph merge, topological maintenance, and
heaviest-bundle consensus — runs as ONE jitted device program per window
bucket, vmapped over the batch.

Motivation: the reference's per-arm loop (align -> add_alignment ->
re-topo-sort, external/spoa/src/graph.cpp:154-353) forces one
host<->device round trip per arm round when only the DP runs on device;
with hundreds of rounds per batch and tens-of-ms dispatch latency the
device path was latency-bound, not compute-bound.  This kernel removes
every round trip: the host uploads packed arms once and downloads the
finished consensus once.

Algorithm ("column-POA"): the executable NumPy twin with identical
tie-breaking lives in hypo_tpu.poa.colpoa_ref (see its docstring for
the two deliberate tie-order differences vs spoa).  Key ideas:

- spoa's aligned-node groups become *columns*: ``col_node[c, base]``
  resolves the group search (graph.cpp:206-259) with one gather.
- the topological order is (column position, node id); column positions
  are maintained by ONE integer argsort per merge instead of a DFS.
- the merge of an alignment path is fully vectorized: the path reduces
  to per-arm-position arrays (matched rank, last-matched cummax), and
  all node creation / column insertion / edge upsert / support updates
  are unique-index scatters — no sequential walk.

Everything is fixed-shape: N node/column capacity, L arm length cap,
K arm count cap, P predecessor cap.  Windows that overflow any cap get
a sticky per-window ``ovf`` flag and fall back to the host engine.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

NW, LOV, ROV = 0, 1, 2
NEG = -(2 ** 30)
BIG = 2 ** 30
NCODES = 6  # A C G T J O


class PoaState(NamedTuple):
    node_code: jnp.ndarray   # [N] i32
    node_col: jnp.ndarray    # [N] i32
    node_sup: jnp.ndarray    # [N] i32
    pred_nd: jnp.ndarray     # [N, P] i32 (node ids, -1 empty)
    pred_w: jnp.ndarray      # [N, P] i32 (sequence counts)
    pred_cnt: jnp.ndarray    # [N] i32
    out_cnt: jnp.ndarray     # [N] i32
    col_pos: jnp.ndarray     # [N] i32 (column -> topo position)
    col_node: jnp.ndarray    # [N, NCODES] i32 (-1 empty)
    n_nodes: jnp.ndarray     # i32
    n_cols: jnp.ndarray      # i32
    ovf: jnp.ndarray         # bool


def init_state(N: int, P: int) -> PoaState:
    return PoaState(
        node_code=jnp.zeros(N, jnp.int32),
        node_col=jnp.zeros(N, jnp.int32),
        node_sup=jnp.zeros(N, jnp.int32),
        pred_nd=jnp.full((N, P), -1, jnp.int32),
        pred_w=jnp.zeros((N, P), jnp.int32),
        pred_cnt=jnp.zeros(N, jnp.int32),
        out_cnt=jnp.zeros(N, jnp.int32),
        col_pos=jnp.zeros(N, jnp.int32),
        col_node=jnp.full((N, NCODES), -1, jnp.int32),
        n_nodes=jnp.int32(0),
        n_cols=jnp.int32(0),
        ovf=jnp.bool_(False),
    )


def _rank_arrays(st: PoaState, N: int):
    """Topological order: sort nodes by (column position, node id).
    rank_of is the inverse permutation, computed as a second argsort —
    TPU scatters serialize per index, sorts don't."""
    idx = jnp.arange(N, dtype=jnp.int32)
    nvalid = idx < st.n_nodes
    key = jnp.where(nvalid, st.col_pos[st.node_col] * N + idx, BIG)
    order = jnp.argsort(key).astype(jnp.int32)
    rank_of = _idx_set(jnp.zeros(N, jnp.int32), order,
                       jnp.ones(N, bool), idx, N)
    pred_nd_r = st.pred_nd[order]                       # [N, P] node ids
    pred_ranks = jnp.where(pred_nd_r >= 0,
                           rank_of[jnp.maximum(pred_nd_r, 0)], -1)
    pred_rows = jnp.where(pred_nd_r >= 0,
                          rank_of[jnp.maximum(pred_nd_r, 0)] + 1, 0)
    pred_cnt_r = jnp.maximum(st.pred_cnt[order], 1)
    node_code_r = st.node_code[order]
    is_end_r = st.out_cnt[order] == 0
    return order, rank_of, node_code_r, pred_rows, pred_ranks, \
        pred_cnt_r, is_end_r, st.pred_w[order]


def _dp(node_code_r, pred_rows, pred_cnt_r, is_end_r, n_nodes, arm,
        arm_len, mode, *, N, L, P, m, n, g):
    """Graph-vs-sequence DP, tie-exact with jax_poa._dp_one."""
    jj = jnp.arange(L + 1, dtype=jnp.int32)
    parange = jnp.arange(P, dtype=jnp.int32)
    H = jnp.full((N + 1, L + 1), NEG, dtype=jnp.int32)
    H = H.at[0].set(jj * g)

    def row_step(H, r):
        code = node_code_r[r]
        prows = pred_rows[r]
        if P == 1:
            Hp = H[prows]
        else:
            pvalid = parange < pred_cnt_r[r]
            Hp = jnp.where(pvalid[:, None], H[prows], NEG)
        prof = jnp.where(arm == code, m, n)
        diag = Hp[:, :-1] + prof[None, :]
        vert = Hp[:, 1:] + g
        tmp = jnp.max(jnp.maximum(diag, vert), axis=0)
        col0 = jnp.where(mode == ROV, 0,
                         jnp.max(Hp[:, 0]) + g).astype(jnp.int32)
        val = jnp.concatenate([col0[None], tmp])
        run = jax.lax.cummax(val - jj * g)
        row = run + jj * g
        h = row[1:]
        bp_j = jnp.full(h.shape, 2 * P, dtype=jnp.int8)
        for p in range(P - 1, -1, -1):
            bp_j = jnp.where(vert[p] == h, jnp.int8(P + p), bp_j)
        for p in range(P - 1, -1, -1):
            bp_j = jnp.where(diag[p] == h, jnp.int8(p), bp_j)
        bp_0 = jnp.int8(P)
        if P > 1:
            vert0 = (Hp[:, 0] + g == col0)
            bp_0 = (P + jnp.argmax(vert0)).astype(jnp.int8)
        bp_row = jnp.concatenate([jnp.broadcast_to(bp_0, (1,)), bp_j])
        H = jax.lax.dynamic_update_slice(H, row[None, :], (r + 1, 0))
        return H, bp_row

    H, bp_rows = jax.lax.scan(row_step, H,
                              jnp.arange(N, dtype=jnp.int32))
    at_L = H[1:, arm_len]
    valid_row = jnp.arange(N) < n_nodes
    elig = jnp.where(mode == LOV, valid_row, valid_row & is_end_r)
    masked = jnp.where(elig, at_L, NEG)
    max_row = (jnp.argmax(masked) + 1).astype(jnp.int32)
    bp = jnp.concatenate([jnp.zeros((1, L + 1), jnp.int8), bp_rows], 0)
    return bp, max_row


def _traceback_matched(bp, pred_rows, arm_len, mode, max_row, *, N, L, P):
    """Walk backpointers; returns matched[j] = rank of the graph node arm
    base j aligned to, or -1 (insertion / unaligned head)."""
    S = N + L + 1

    def cond(s):
        i, j, t, _ = s
        stop_nw = (i == 0) & (j == 0)
        stop_rov = (i == 0) | (j == 0)
        stop = jnp.where(mode == ROV, stop_rov, stop_nw)
        return (~stop) & (t < S)

    def body(s):
        i, j, t, matched = s
        code = bp[i, j].astype(jnp.int32)
        is_vert = (code >= P) & (code < 2 * P)
        is_horiz = code == 2 * P
        pidx = jnp.where(code < P, code, code - P)
        pred = pred_rows[jnp.maximum(i - 1, 0), pidx]
        prev_i = jnp.where(is_horiz, i, pred)
        prev_j = jnp.where(is_vert, j, j - 1)
        prev_i = jnp.where(i == 0, 0, prev_i)
        prev_j = jnp.where(i == 0, j - 1, prev_j)
        emit = prev_j != j                      # a base was consumed
        diag = emit & (prev_i != i) & (i > 0)   # aligned to node rank i-1
        upd = jnp.where(diag, i - 1, -1)
        matched = jnp.where(
            emit,
            matched.at[jnp.maximum(j - 1, 0)].set(upd),
            matched)
        return prev_i, prev_j, t + 1, matched

    matched0 = jnp.full((L,), -1, dtype=jnp.int32)
    _i, _j, _t, matched = jax.lax.while_loop(
        cond, body, (max_row, arm_len, jnp.int32(0), matched0))
    return matched


def _eq(idx, mask, M: int):
    """[L, M] hit matrix for masked indices.  TPU scatters lower to
    per-index serial updates; a compare+reduce fuses into one vector
    pass with no materialized intermediate, so every merge update below
    is built on this."""
    sel = jnp.where(mask, idx, -1)
    return sel[:, None] == jnp.arange(M, dtype=jnp.int32)[None, :]


def _idx_set(old, idx, mask, vals, M: int):
    """old[i] := vals[l] where idx[l] == i & mask[l] (unique hits)."""
    eq = _eq(idx, mask, M)
    val = jnp.max(jnp.where(eq, vals[:, None], NEG), axis=0)
    cov = jnp.any(eq, axis=0)
    return jnp.where(cov, val.astype(old.dtype), old)


def _idx_add(old, idx, mask, M: int, vals=None):
    """old[i] += sum of vals[l] (default 1) over {l : idx[l] == i &
    mask[l]}."""
    eq = _eq(idx, mask, M)
    if vals is None:
        add = jnp.sum(eq, axis=0)
    else:
        add = jnp.sum(jnp.where(eq, vals[:, None], 0), axis=0)
    return old + add.astype(old.dtype)


def _merge(st: PoaState, order, matched, arm, arm_len, w, *, N, L, P):
    """Vectorized graph merge of one aligned arm (colpoa_ref.ColPoa.add).
    ``order`` is the topological permutation from _rank_arrays (passed in
    so the argsort is computed once per arm step).  ``w`` is the arm's
    multiplicity weight: merging one arm with weight w is equivalent to
    merging w identical copies (the DP depends only on graph structure,
    never on weights, and an identical copy re-aligns onto its own
    path), which lets the runner deduplicate the many identical arms
    that high-accuracy short reads produce.  Returns (new state,
    overflowed bool)."""
    jj = jnp.arange(L, dtype=jnp.int32)
    valid_j = jj < arm_len
    is_match = (matched >= 0) & valid_j
    # resolve matched nodes through their column
    node0 = jnp.where(is_match, order[jnp.maximum(matched, 0)], 0)
    c_match = jnp.where(is_match, st.node_col[node0], 0)
    exist = jnp.where(
        is_match,
        st.col_node.reshape(-1)[c_match * NCODES + arm], -1)
    creates_node = valid_j & ((~is_match) | (exist < 0))
    new_ord = jnp.cumsum(creates_node.astype(jnp.int32))
    node_j = jnp.where(creates_node, st.n_nodes - 1 + new_ord,
                       jnp.where(is_match, exist, -1))
    is_ins = valid_j & ~is_match
    newcol_ord = jnp.cumsum(is_ins.astype(jnp.int32))
    new_col_id = st.n_cols - 1 + newcol_ord
    col_j = jnp.where(is_match, c_match, new_col_id)
    n_new_nodes = new_ord[L - 1]
    n_new_cols = newcol_ord[L - 1]
    ovf = (st.n_nodes + n_new_nodes > N) | (st.n_cols + n_new_cols > N)

    # column renumbering, arithmetically (no sort): every inserted run
    # of columns is anchored after the last matched column position
    # ("lastpos", the column-key scheme in colpoa_ref); an existing
    # column at position p shifts by the number of insertions anchored
    # strictly before p, and inserted column t of the run anchored at q
    # lands at q + shift(q) + t.  Positions use the state BEFORE this
    # arm (matched column positions are unchanged during the merge).
    mpos = jnp.where(is_match, st.col_pos[c_match], -BIG)
    lastpos = jnp.maximum(jax.lax.cummax(mpos), -1)
    lastj = jax.lax.cummax(jnp.where(is_match, jj, -1))
    hist = _idx_add(jnp.zeros(N + 1, jnp.int32), lastpos + 1, is_ins,
                    N + 1)
    cs = jnp.cumsum(hist)            # cs[q+1] = #ins anchored at <= q
    cidx = jnp.arange(N, dtype=jnp.int32)
    col_pos_exist = jnp.where(
        cidx < st.n_cols,
        st.col_pos + cs[jnp.minimum(st.col_pos, N)], st.col_pos)
    anchor_shift = jnp.where(lastpos >= 0,
                             cs[jnp.maximum(lastpos, 0)], 0)
    pos_new = lastpos + anchor_shift + (jj - lastj)
    col_pos = _idx_set(col_pos_exist, new_col_id, is_ins, pos_new, N)

    # node updates (all target indices unique; see colpoa_ref docstring)
    node_code = _idx_set(st.node_code, node_j, creates_node, arm, N)
    node_col = _idx_set(st.node_col, node_j, creates_node, col_j, N)
    wv = jnp.broadcast_to(w, (L,))
    node_sup = _idx_add(st.node_sup, node_j, valid_j, N, vals=wv)
    col_node = _idx_set(
        st.col_node.reshape(-1), col_j * NCODES + arm, creates_node,
        node_j, N * NCODES).reshape(N, NCODES)

    # edge upserts between consecutive emitted bases
    u = jnp.concatenate([jnp.full((1,), -1, jnp.int32), node_j[:-1]])
    v = node_j
    edge_valid = valid_j & (jj >= 1)
    pv = st.pred_nd[jnp.maximum(v, 0)]                # [L, P]
    hit = pv == u[:, None]
    has = jnp.any(hit, axis=1) & edge_valid
    vcnt = st.pred_cnt[jnp.maximum(v, 0)]
    slot = jnp.where(has, jnp.argmax(hit, axis=1), vcnt)
    ovf = ovf | jnp.any(edge_valid & ~has & (slot >= P))
    slot_c = jnp.minimum(slot, P - 1)
    eflat = v * P + slot_c
    pred_w = _idx_add(st.pred_w.reshape(-1), eflat, edge_valid,
                      N * P, vals=wv).reshape(N, P)
    newslot = edge_valid & ~has
    pred_nd = _idx_set(st.pred_nd.reshape(-1), eflat, newslot, u,
                       N * P).reshape(N, P)
    pred_cnt = _idx_add(st.pred_cnt, v, newslot, N)
    out_cnt = _idx_add(st.out_cnt, u, newslot, N)

    new_st = PoaState(
        node_code=node_code, node_col=node_col, node_sup=node_sup,
        pred_nd=pred_nd, pred_w=pred_w, pred_cnt=pred_cnt,
        out_cnt=out_cnt, col_pos=col_pos, col_node=col_node,
        n_nodes=st.n_nodes + n_new_nodes, n_cols=st.n_cols + n_new_cols,
        ovf=st.ovf)
    return new_st, ovf


def _arm_step_batch(st: PoaState, arm, arm_len, mode, active, w=None, *,
                    N, L, P, m, n, g, dp_impl):
    """One arm round for the WHOLE window batch: rank/traceback/merge are
    vmapped per window, but the DP — the dominant compute — runs as ONE
    batched kernel call, so the Pallas kernel (pallas_poa) can serve the
    production path (VERDICT r1 item 1; the reference's analog is its
    SIMD engine, external/spoa/src/simd_alignment_engine.cpp:46-142).

    st leaves carry a leading batch dim B; arm [B, L]; arm_len, mode,
    active [B]."""
    (order, _rank_of, node_code_r, pred_rows, _pred_ranks, pred_cnt_r,
     is_end_r, _pw) = jax.vmap(_rank_arrays, in_axes=(0, None))(st, N)
    if dp_impl in ("pallas", "pallas_interpret"):
        from .pallas_poa import poa_dp_batch_pallas
        bp, max_row = poa_dp_batch_pallas(
            node_code_r, pred_rows, pred_cnt_r, is_end_r, st.n_nodes,
            arm, arm_len, mode, N=N, L=L, P=P, m=m, n=n, g=g,
            interpret=(dp_impl == "pallas_interpret"))
    else:
        bp, max_row = jax.vmap(functools.partial(
            _dp, N=N, L=L, P=P, m=m, n=n, g=g))(
                node_code_r, pred_rows, pred_cnt_r, is_end_r,
                st.n_nodes, arm, arm_len, mode)
    matched = jax.vmap(functools.partial(
        _traceback_matched, N=N, L=L, P=P))(
            bp, pred_rows, arm_len, mode, max_row)
    # empty graph (first sequence): everything is an insertion
    matched = jnp.where((st.n_nodes == 0)[:, None], -1, matched)
    if w is None:
        w = jnp.ones_like(arm_len)
    new_st, ovf = jax.vmap(functools.partial(
        _merge, N=N, L=L, P=P))(st, order, matched, arm, arm_len, w)
    apply = active & (arm_len > 0) & ~st.ovf & ~ovf

    def _sel(a, b):
        keep = apply.reshape(apply.shape + (1,) * (b.ndim - 1))
        return jnp.where(keep, b, a)

    out = jax.tree_util.tree_map(_sel, st, new_st)
    out = out._replace(
        ovf=st.ovf | (active & (arm_len > 0) & ovf))
    return out


def _consensus(st: PoaState, *, N, P, max_branch_iters=None):
    """Heaviest-bundle consensus with spoa's tie rule and branch
    completion (graph.cpp:610-705), in rank space."""
    if max_branch_iters is None:
        max_branch_iters = N
    (order, rank_of, node_code_r, _pred_rows, pred_ranks, pred_cnt_r,
     is_end_r, pred_w_r) = _rank_arrays(st, N)
    nn = st.n_nodes
    parange = jnp.arange(P, dtype=jnp.int32)
    node_sup_r = st.node_sup[order]
    rank0_of_node0 = rank_of[0]

    def relax_row(scores, preds, r, banned):
        """One node's in-edge fold, mirroring graph.cpp:618-624."""
        pr = pred_ranks[r]            # [P], -1 invalid
        w = pred_w_r[r]
        slot_ok = (parange < pred_cnt_r[r]) & (pr >= 0)
        sc_p = jnp.where(slot_ok, scores[jnp.maximum(pr, 0)], NEG)
        if banned:
            slot_ok = slot_ok & (sc_p != -1)
        best_w, best_pr, best_sc = (jnp.int32(-1), jnp.int32(-1),
                                    jnp.int32(NEG))
        for p in range(P):
            take = slot_ok[p] & (
                (best_w < w[p])
                | ((best_w == w[p]) & (best_sc <= sc_p[p])))
            best_w = jnp.where(take, w[p], best_w)
            best_pr = jnp.where(take, pr[p], best_pr)
            best_sc = jnp.where(take, sc_p[p], best_sc)
        score = jnp.where(best_pr >= 0, best_w + best_sc, -1)
        return score, best_pr

    # -- first pass ------------------------------------------------------
    def first_step(carry, r):
        scores, preds, max_r = carry
        score, best_pr = relax_row(scores, preds, r, banned=False)
        valid = r < nn
        score = jnp.where(valid, score, -1)
        best_pr = jnp.where(valid, best_pr, -1)
        scores = scores.at[r].set(score)
        preds = preds.at[r].set(best_pr)
        take = valid & (scores[max_r] < score)
        max_r = jnp.where(take, r, max_r)
        return (scores, preds, max_r), None

    scores0 = jnp.full((N,), -1, jnp.int32)
    preds0 = jnp.full((N,), -1, jnp.int32)
    (scores, preds, max_r), _ = jax.lax.scan(
        first_step, (scores0, preds0, rank0_of_node0),
        jnp.arange(N, dtype=jnp.int32))

    # -- branch completion (graph.cpp:660-705) ---------------------------
    def bc_cond(s):
        scores, preds, max_r, it = s
        not_end = ~is_end_r[jnp.maximum(max_r, 0)]
        return not_end & (it < max_branch_iters) & (nn > 0)

    def bc_body(s):
        scores, preds, max_r, it = s
        rank0 = max_r
        # ban other predecessors of every direct successor of rank0
        succ = jnp.any(
            (pred_ranks == rank0) & (parange[None, :] <
                                     pred_cnt_r[:, None]), axis=1)
        ban_mask = (succ[:, None] & (pred_ranks >= 0)
                    & (pred_ranks != rank0)
                    & (parange[None, :] < pred_cnt_r[:, None]))
        banned = jnp.any(_eq(pred_ranks.reshape(-1),
                             ban_mask.reshape(-1), N), axis=0)
        scores = jnp.where(banned, -1, scores)

        def re_step(carry, r):
            scores, preds, max_sc, max_r2 = carry
            in_suffix = (r > rank0) & (r < nn)
            sc_reset = jnp.where(in_suffix, -1, scores[r])
            pr_reset = jnp.where(in_suffix, -1, preds[r])
            scores = scores.at[r].set(sc_reset)
            preds = preds.at[r].set(pr_reset)
            score, best_pr = relax_row(scores, preds, r, banned=True)
            scores = scores.at[r].set(
                jnp.where(in_suffix, score, scores[r]))
            preds = preds.at[r].set(
                jnp.where(in_suffix, best_pr, preds[r]))
            take = in_suffix & (max_sc < scores[r])
            max_sc = jnp.where(take, scores[r], max_sc)
            max_r2 = jnp.where(take, r, max_r2)
            return (scores, preds, max_sc, max_r2), None

        (scores, preds, _msc, max_r2), _ = jax.lax.scan(
            re_step, (scores, preds, jnp.int32(0), rank0_of_node0),
            jnp.arange(N, dtype=jnp.int32))
        return scores, preds, max_r2, it + 1

    scores, preds, max_r, _it = jax.lax.while_loop(
        bc_cond, bc_body, (scores, preds, max_r, jnp.int32(0)))

    # -- backtrack (emit backward, then reverse) -------------------------
    def bt_cond(s):
        r, t, _c, _u = s
        return (r >= 0) & (t < N)

    def bt_body(s):
        r, t, codes, sups = s
        codes = codes.at[t].set(node_code_r[jnp.maximum(r, 0)])
        sups = sups.at[t].set(node_sup_r[jnp.maximum(r, 0)])
        return preds[jnp.maximum(r, 0)], t + 1, codes, sups

    codes0 = jnp.zeros((N,), jnp.int32)
    sups0 = jnp.zeros((N,), jnp.int32)
    start_r = jnp.where(nn > 0, max_r, -1)
    _r, cons_len, codes_bwd, sups_bwd = jax.lax.while_loop(
        bt_cond, bt_body, (start_r, jnp.int32(0), codes0, sups0))
    ridx = jnp.maximum(cons_len - 1 - jnp.arange(N, dtype=jnp.int32), 0)
    cons_codes = codes_bwd[ridx]
    cons_sup = sups_bwd[ridx]
    return cons_codes, cons_sup, cons_len


def resolve_dp_impl(dp_impl: str = "auto") -> str:
    """'auto' -> the Pallas kernel on TPU, the XLA scan elsewhere.
    HYPO_DP_IMPL overrides (xla | pallas | pallas_interpret)."""
    import os
    env = os.environ.get("HYPO_DP_IMPL")
    if env:
        return env
    if dp_impl != "auto":
        return dp_impl
    return "pallas" if jax.default_backend() == "tpu" else "xla"


@functools.partial(jax.jit,
                   static_argnames=("N", "L", "K", "P", "m", "n", "g",
                                    "dp_impl"))
def _poa_full_batch_impl(arms, arm_len, arm_mode, n_arms, *, N, L, K, P,
                         m, n, g, dp_impl):
    B = arms.shape[0]
    st0 = init_state(N, P)
    st = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), st0)

    def step(st, inp):
        arm, alen, mode, k = inp          # [B, L], [B], [B], scalar
        st = _arm_step_batch(st, arm, alen, mode, k < n_arms,
                             N=N, L=L, P=P, m=m, n=n, g=g,
                             dp_impl=dp_impl)
        return st, None

    st, _ = jax.lax.scan(
        step, st,
        (arms.transpose(1, 0, 2), arm_len.T, arm_mode.T,
         jnp.arange(K, dtype=jnp.int32)))
    cons_codes, cons_sup, cons_len = jax.vmap(
        functools.partial(_consensus, N=N, P=P))(st)
    return cons_codes, cons_sup, cons_len, st.ovf


def poa_full_batch(arms, arm_len, arm_mode, n_arms, *, N: int, L: int,
                   K: int, P: int, m: int, n: int, g: int,
                   dp_impl: str = "auto"):
    """Full POA for a batch of windows in one device program.

    arms [B, K, L] i32 global codes; arm_len [B, K] i32;
    arm_mode [B, K] i32 (NW/LOV/ROV); n_arms [B] i32.
    Returns (cons_codes [B, N], cons_sup [B, N], cons_len [B],
    ovf [B] bool).
    """
    return _poa_full_batch_impl(
        arms, arm_len, arm_mode, n_arms, N=N, L=L, K=K, P=P,
        m=m, n=n, g=g, dp_impl=resolve_dp_impl(dp_impl))


# -- chunked-K program set (the production runner's path) --------------------
#
# Compiling one program per (N, L, K) bucket shape made the pipeline pay
# a fresh ~15-25 s executable build/load per shape per process (the axon
# remote backend cannot amortize it, and the persistent jit cache does
# not remove the load).  Instead the arm dimension is CHUNKED: one
# compiled `chunk` program consumes Kc arms per call and carries the
# PoaState on device between calls (donated buffers, so no copies and no
# host round trips), and one `finish` program runs consensus + packing.
# Three small programs therefore cover windows with ANY arm count, and
# the batch dimension is sharded over all local devices with shard_map
# (every op inside is per-window, so no collectives are needed).


def _bcast_state(N: int, P: int, B: int) -> PoaState:
    st0 = init_state(N, P)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), st0)


@functools.lru_cache(maxsize=None)
def build_chunk_programs(*, N: int, L: int, Kc: int, P: int, m: int,
                         n: int, g: int, B: int, dp_impl: str,
                         ndev: int):
    """Returns (init, chunk, finish) jitted callables for batch tile B.

    init() -> state; chunk(state, arms i8 [B,Kc,L], alen i32 [B,Kc],
    amode i8 [B,Kc]) -> state (donates state); finish(state) -> packed
    int32 [B, 2N+2] (codes | support | len | ovf).  Batch is sharded
    over the first `ndev` local devices (B must divide by ndev)."""
    from jax.sharding import Mesh, PartitionSpec
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    devs = jax.local_devices()[:ndev]
    mesh = Mesh(np.array(devs), ("b",))
    pspec = PartitionSpec("b")
    state_specs = PoaState(*([pspec] * len(PoaState._fields)))
    Bl = B // ndev

    def init_local():
        return _bcast_state(N, P, Bl)

    def chunk_local(st, arms, alen, amode, aw):
        def step(st, inp):
            arm, al, md, w = inp
            st = _arm_step_batch(
                st, arm.astype(jnp.int32), al, md.astype(jnp.int32),
                al > 0, w, N=N, L=L, P=P, m=m, n=n, g=g,
                dp_impl=dp_impl)
            return st, None
        st, _ = jax.lax.scan(
            step, st, (arms.transpose(1, 0, 2), alen.T, amode.T, aw.T))
        return st

    def finish_local(st, th):
        """Consensus + on-device curation + nibble packing.  th [B] i32
        is the per-window curate threshold (0 keeps every base, the
        short-window case); filtering on device means the support array
        never crosses the (slow) device->host link.  Output int8
        [B, N//2 + 4]: nibble-packed codes | len lo | len hi | ovf | 0.
        """
        cc, cs, cl = jax.vmap(
            functools.partial(_consensus, N=N, P=P))(st)
        idx = jnp.arange(N, dtype=jnp.int32)[None, :]
        keep = (idx < cl[:, None]) & (cs >= th[:, None])
        dst = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
        clen = dst[:, -1] + 1
        sel = jnp.where(keep, dst, N)  # parked slot N dropped below
        onehot = sel[:, :, None] == idx[0][None, None, :]
        curated = jnp.max(
            jnp.where(onehot, cc[:, :, None], 0), axis=1
        ).astype(jnp.int8)                                    # [B, N]
        lo = curated[:, 0::2]
        hi = curated[:, 1::2]
        packed = (lo | (hi << 4)).astype(jnp.int8)            # [B, N//2]
        meta = jnp.stack([
            (clen & 0xFF).astype(jnp.int8),
            ((clen >> 8) & 0xFF).astype(jnp.int8),
            st.ovf.astype(jnp.int8),
            jnp.zeros_like(clen, jnp.int8)], axis=1)
        return jnp.concatenate([packed, meta], axis=1)

    init = jax.jit(shard_map(init_local, mesh=mesh, in_specs=(),
                             out_specs=state_specs, check_vma=False))
    chunk = jax.jit(shard_map(
        chunk_local, mesh=mesh,
        in_specs=(state_specs, pspec, pspec, pspec, pspec),
        out_specs=state_specs, check_vma=False), donate_argnums=(0,))
    finish = jax.jit(shard_map(
        finish_local, mesh=mesh, in_specs=(state_specs, pspec),
        out_specs=pspec, check_vma=False), donate_argnums=(0,))
    return init, chunk, finish


@functools.partial(jax.jit,
                   static_argnames=("N", "L", "K", "P", "m", "n", "g",
                                    "dp_impl"))
def _poa_full_batch_packed_impl(arms, arm_len, arm_mode, n_arms, *,
                                N, L, K, P, m, n, g, dp_impl):
    cc, cs, cl, ovf = _poa_full_batch_impl(
        arms, arm_len, arm_mode, n_arms, N=N, L=L, K=K, P=P,
        m=m, n=n, g=g, dp_impl=dp_impl)
    return jnp.concatenate(
        [cc, cs, cl[:, None], ovf.astype(jnp.int32)[:, None]], axis=1)


def poa_full_batch_packed(arms, arm_len, arm_mode, n_arms, *, N: int,
                          L: int, K: int, P: int, m: int, n: int,
                          g: int, dp_impl: str = "auto"):
    """Same as poa_full_batch but packs everything into ONE int32 array
    [B, 2N+2] (codes | support | len | ovf) so the host needs a single
    device->host transfer per dispatch (high-latency links)."""
    return _poa_full_batch_packed_impl(
        arms, arm_len, arm_mode, n_arms, N=N, L=L, K=K, P=P,
        m=m, n=n, g=g, dp_impl=resolve_dp_impl(dp_impl))
