"""Multi-chip sharding for the polishing pipeline.

The reference is single-node OpenMP (SURVEY §2.3); the TPU-native scaling
design is:

- windows are embarrassingly parallel after arm fill -> data-parallel
  sharding of window batches over the mesh ('win' axis), each chip
  running the batched POA DP on its shard;
- k-mer coverage histograms are merged with psum over the mesh (the one
  true cross-device reduction in the pipeline);
- contigs are sharded across hosts at the process level (each host
  streams its own BAM shard), which needs no in-program communication.

``sharded_polish_step`` is the jitted multi-chip device step: POA DP on
the local window shard + global histogram psum.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..poa import jax_poa


def make_mesh(n_devices: Optional[int] = None, axis: str = "win") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return jax.make_mesh((n,), (axis,), devices=devs[:n])


def device_kmer_histogram(reads: jnp.ndarray, k: int, nbins: int
                          ) -> jnp.ndarray:
    """Histogram of (forward) k-mer codes over a [B, R] batch of reads
    (codes 0..3, padding 4+).  nbins must be 4**k (k small enough for a
    dense device histogram; the host sparse counter covers large k)."""
    B, R = reads.shape
    c = reads.astype(jnp.int32)
    km = jnp.zeros((B, R - k + 1), dtype=jnp.int32)
    bad = jnp.zeros((B, R - k + 1), dtype=jnp.bool_)
    for j in range(k):  # k is static and small
        cj = jax.lax.dynamic_slice_in_dim(c, j, R - k + 1, axis=1)
        km = (km << 2) | jnp.where(cj > 3, 0, cj)
        bad = bad | (cj > 3)
    km = jnp.where(bad, nbins, km)  # out-of-range -> dropped by bincount
    return jnp.bincount(km.reshape(-1), length=nbins)


def make_sharded_polish_step(mesh: Mesh, N: int, L: int, Pcap: int,
                             k: int, nbins: int, scores):
    """Build the jitted multi-chip step: (window shard DP, psum'd k-mer
    histogram).  Inputs are globally-shaped arrays sharded on their batch
    dimension over the 'win' axis."""
    m, n, g = scores
    spec_b = P("win")

    def local_step(node_code, pred_rows, pred_cnt, is_end, n_nodes, arm,
                   arm_len, mode, reads):
        bp, max_row = jax_poa.poa_dp_batch(
            node_code, pred_rows, pred_cnt, is_end, n_nodes, arm, arm_len,
            mode, N=N, L=L, P=Pcap, m=m, n=n, g=g)
        hist = device_kmer_histogram(reads, k, nbins)
        hist = jax.lax.psum(hist, "win")
        return bp, max_row, hist

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(spec_b,) * 8 + (spec_b,),
        out_specs=(spec_b, spec_b, P()),
        check_vma=False)
    return jax.jit(sharded)


def sharded_polish_step(mesh: Mesh, inputs, N: int, L: int, Pcap: int,
                        k: int, nbins: int, scores):
    step = make_sharded_polish_step(mesh, N, L, Pcap, k, nbins, scores)
    return step(*inputs)


def make_example_inputs(B: int, N: int, L: int, Pcap: int, R: int,
                        rng_seed: int = 0):
    """Random-but-valid inputs for the sharded step: each window's graph
    is a simple chain of N nodes (a fresh backbone), arms are random."""
    rng = np.random.default_rng(rng_seed)
    node_code = rng.integers(0, 4, size=(B, N)).astype(np.int32)
    pred_rows = np.zeros((B, N, Pcap), dtype=np.int32)
    pred_rows[:, :, 0] = np.arange(N)[None, :]  # chain: row r preds row r
    pred_cnt = np.ones((B, N), dtype=np.int32)
    is_end = np.zeros((B, N), dtype=bool)
    is_end[:, -1] = True
    n_nodes = np.full(B, N, dtype=np.int32)
    arm = rng.integers(0, 4, size=(B, L)).astype(np.int32)
    arm_len = np.full(B, L, dtype=np.int32)
    mode = np.zeros(B, dtype=np.int32)
    reads = rng.integers(0, 4, size=(B, R)).astype(np.int32)
    return (node_code, pred_rows, pred_cnt, is_end, n_nodes, arm, arm_len,
            mode, reads)
