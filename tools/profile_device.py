"""Per-component timing of the device tile program on the real chip.

Builds a realistic mid-POA batch state by running a few mutated arms
through the XLA arm-step path on CPU, broadcasts it to tile batch size,
then times each tile component on the TPU:

  rank   _rank_arrays_batch          (the per-arm-step topo recompute)
  dp     pallas DP kernel            (graph-vs-arm alignment)
  tb     _traceback_matched_batch    (lockstep backpointer walk)
  merge  vmapped _merge              (graph merge of the aligned arm)
  cons   heaviest-bundle consensus   (scalar-core pallas kernel)
  tile   the full production tile program (K arm steps + consensus)

Timing dodges the tunneled runtime's post-readback polling mode by
enqueueing M dispatches and blocking once: t(M)-t(1) ~= (M-1)*compute.

Usage: python tools/profile_device.py [B] [reps]
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_state_cpu(nwin: int, n_arms: int, L: int, N: int, P: int,
                    seed: int = 0):
    """Run n_arms mutated arms per window through the CPU/XLA arm step;
    returns the PoaState leaves as numpy plus one extra arm batch."""
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    from hypo_tpu.poa import device_full as df
    rng = np.random.default_rng(seed)
    base_len = L - 6
    arms = np.zeros((n_arms + 1, nwin, L), np.int32)
    alens = np.zeros((n_arms + 1, nwin), np.int32)
    for w in range(nwin):
        base = rng.integers(0, 4, base_len)
        for a in range(n_arms + 1):
            s = base.copy()
            # ~3% mutations: subs + occasional indel
            nmut = max(1, int(0.03 * base_len))
            pos = rng.choice(base_len, nmut, replace=False)
            s[pos] = (s[pos] + rng.integers(1, 4, nmut)) % 4
            if a % 3 == 1:
                cut = rng.integers(1, base_len - 1)
                s = np.delete(s, cut)
            arms[a, w, :len(s)] = s
            alens[a, w] = len(s)
    step = jax.jit(functools.partial(
        df._arm_step_batch, N=N, L=L, P=P, m=5, n=-4, g=-8,
        dp_impl="xla"))
    st = df._bcast_state(N, P, nwin)
    mode = np.zeros(nwin, np.int32)
    active = np.ones(nwin, bool)
    for a in range(n_arms):
        st = step(st, arms[a], alens[a], mode, active)
    st_np = jax.tree_util.tree_map(np.asarray, st)
    return st_np, np.asarray(arms[n_arms]), np.asarray(alens[n_arms])


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    L, N, K, P = 126, 256, 16, 8
    nwin, n_arms = 64, 5

    import os
    import pickle as _p
    if os.path.exists("/tmp/prof_state_cache.pkl"):
        with open("/tmp/prof_state_cache.pkl", "rb") as f:
            st_small, arm_s, alen_s = _p.load(f)
        print("[prof] using cached CPU state", flush=True)
    else:
        print(f"[prof] building CPU state ({nwin} windows, "
              f"{n_arms} arms)", flush=True)
        t0 = time.time()
        st_small, arm_s, alen_s = build_state_cpu(nwin, n_arms, L, N, P)
        print(f"[prof] state built in {time.time()-t0:.1f}s", flush=True)
        with open("/tmp/prof_state_cache.pkl", "wb") as f:
            _p.dump((st_small, arm_s, alen_s), f)

    # re-exec point: now import jax on the TPU in a fresh interpreter?
    # JAX_PLATFORMS was set to cpu above for this process; spawn a
    # child for the TPU half with the state on disk.
    import pickle
    with open("/tmp/prof_state.pkl", "wb") as f:
        pickle.dump((st_small, arm_s, alen_s, B, reps), f)
    import subprocess
    r = subprocess.run([sys.executable, __file__, "--tpu-half"],
                       cwd=".")
    sys.exit(r.returncode)


def tpu_half():
    import pickle
    with open("/tmp/prof_state.pkl", "rb") as f:
        st_small, arm_s, alen_s, B, reps = pickle.load(f)
    L, N, K, P = 126, 256, 16, 8
    import jax
    import jax.numpy as jnp
    from hypo_tpu.poa import device_full as df
    from hypo_tpu.poa.device_full import PoaState
    print(f"[prof] backend={jax.default_backend()} B={B}", flush=True)
    nwin = st_small.node_code.shape[0]
    tile = (B + nwin - 1) // nwin

    def blow(x):
        reps_ = np.tile(np.asarray(x), (tile,) + (1,) * (x.ndim - 1))
        return reps_[:B]

    st = PoaState(*[blow(leaf) for leaf in st_small])
    arm = blow(arm_s)
    alen = blow(alen_s)
    mode = np.zeros(B, np.int32)
    active = np.ones(B, bool)
    dev = jax.devices()[0]
    put = lambda t: jax.device_put(t, dev)  # noqa: E731
    st = jax.tree_util.tree_map(put, st)
    arm, alen, mode, active = map(put, (arm, alen, mode, active))

    # component fns
    rank_fn = jax.jit(functools.partial(df._rank_arrays_batch, N=N))
    ra = jax.block_until_ready(rank_fn(st))

    from hypo_tpu.poa.pallas_poa import poa_dp_batch_pallas
    dp_fn = jax.jit(lambda *a: poa_dp_batch_pallas(
        *a, N=N, L=L, P=P, m=5, n=-4, g=-8))
    bp, max_row = jax.block_until_ready(dp_fn(
        ra.node_code_r, ra.pred_rows, ra.pred_cnt_r, ra.is_end_r,
        st.n_nodes, arm, alen, mode))

    tb_fn = jax.jit(functools.partial(
        df._traceback_matched_batch, N=N, L=L, P=P))
    matched = jax.block_until_ready(
        tb_fn(bp, ra.pred_rows, alen, mode, max_row))

    w1 = jnp.ones(B, jnp.int32)
    merge_fn = jax.jit(lambda st, order, ncr, matched, arm, alen, w:
                       jax.vmap(functools.partial(
                           df._merge, N=N, L=L, P=P))(
                           st, order, ncr, matched, arm, alen, w))
    _ = jax.block_until_ready(merge_fn(
        st, ra.order, ra.node_col_r, matched, arm, alen, w1))

    from hypo_tpu.poa.pallas_consensus import heaviest_bundle_pallas
    cons_fn = jax.jit(lambda ra, nn: heaviest_bundle_pallas(
        ra.pred_ranks, ra.pred_w_r, ra.pred_cnt_r, ra.is_end_r,
        ra.node_code_r, ra.node_sup_r, nn, ra.rank_of[:, 0], N=N, P=P))
    _ = jax.block_until_ready(cons_fn(ra, st.n_nodes))

    step_fn = jax.jit(functools.partial(
        df._arm_step_batch, N=N, L=L, P=P, m=5, n=-4, g=-8,
        dp_impl="pallas"))
    _ = jax.block_until_ready(step_fn(st, arm, alen, mode, active))

    # block_until_ready on the tunneled axon runtime returns without
    # waiting (only a D2H transfer really syncs), so each component is
    # looped M times INSIDE one jit (live scalar carry defeats DCE;
    # jnp.roll by the loop index defeats hoisting) and timed with one
    # scalar readback; per-call = (t(M=17)-t(M=1))/16, which cancels
    # the constant dispatch/readback/polling overhead.

    def tree_tag(tree, i32):
        """Perturb one int leaf with (i % 1), an XLA-opaque zero."""
        z = jax.lax.rem(i32, jnp.int32(1))
        return jax.tree_util.tree_map(
            lambda x: x + z.astype(x.dtype) if x.dtype != jnp.bool_
            else x, tree)

    def timeit(name, body_fn):
        """body_fn(i) -> f32 scalar contribution."""
        def looped(M):
            def run():
                def body(i, acc):
                    return acc + body_fn(i)
                return jax.lax.fori_loop(0, M, body, jnp.float32(0))
            return jax.jit(run)

        ts = {}
        for M in (1, 17):
            fn = looped(M)
            _ = float(np.asarray(fn()))      # compile + flip polling
            best = 1e9
            for _r in range(2):
                t0 = time.time()
                _ = float(np.asarray(fn()))
                best = min(best, time.time() - t0)
            ts[M] = best
        per = (ts[17] - ts[1]) / 16
        print(f"[prof] {name:8s}: {per*1e3:8.1f} ms/call "
              f"(t1={ts[1]*1e3:.0f}ms t17={ts[17]*1e3:.0f}ms)",
              flush=True)
        return per

    def rank_body(i):
        ra2 = rank_fn(tree_tag(st, i))
        return jnp.sum(ra2.rank_of[:, 0].astype(jnp.float32))

    def dp_body(i):
        bp2, mr2 = dp_fn(ra.node_code_r + jax.lax.rem(i, jnp.int32(1)),
                         ra.pred_rows, ra.pred_cnt_r, ra.is_end_r,
                         st.n_nodes, arm, alen, mode)
        return jnp.sum(mr2.astype(jnp.float32))

    def tb_body(i):
        m2 = tb_fn(bp + jax.lax.rem(i, jnp.int32(1)).astype(bp.dtype),
                   ra.pred_rows, alen, mode, max_row)
        return jnp.sum(m2[:, 0].astype(jnp.float32))

    def merge_body(i):
        st2, ovf2 = merge_fn(tree_tag(st, i), ra.order, ra.node_col_r,
                             matched, arm, alen, w1)
        return jnp.sum(st2.n_nodes.astype(jnp.float32))

    def cons_body(i):
        c2, s2, l2 = cons_fn(
            ra._replace(node_code_r=ra.node_code_r
                        + jax.lax.rem(i, jnp.int32(1))), st.n_nodes)
        return jnp.sum(l2.astype(jnp.float32))

    def step_body(i):
        st2 = step_fn(tree_tag(st, i), arm, alen, mode, active)
        return jnp.sum(st2.n_nodes.astype(jnp.float32))

    timeit("rank", rank_body)
    timeit("dp", dp_body)
    timeit("tb", tb_body)
    timeit("merge", merge_body)
    timeit("cons", cons_body)
    timeit("step", step_body)


if __name__ == "__main__":
    if "--tpu-half" in sys.argv:
        tpu_half()
    else:
        main()
