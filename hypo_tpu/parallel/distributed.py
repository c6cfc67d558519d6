"""Multi-host (pod-slice) distribution for the polishing pipeline.

The reference is a single OpenMP process (SURVEY §2.3); its only scaling
knob beyond threads is contig batching.  The TPU-native layout over a
pod slice:

- **Contigs shard across hosts** (size-balanced greedy assignment, no
  in-program communication): each host streams its own slice of the
  BAM (the draft-contig-sorted order lets every host skip to its shard)
  and polishes its contigs end-to-end.
- **Solid k-mers are global state**: every host must see counts from
  ALL reads.  Read files are sharded across hosts; local histograms are
  merged with one ``psum`` over the global device mesh (the pipeline's
  single cross-host reduction, SURVEY §5).
- **Output gathers at rank 0**: hosts write per-shard FASTA; rank 0
  concatenates in draft order (host filesystem gather — polished
  contigs are not device state).

On a single process everything degrades to the local path, which keeps
this module fully testable without pod hardware.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[int, int]:
    """jax.distributed glue.  Returns (process_id, num_processes).
    No-op single-process fallback when no coordinator is configured."""
    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return jax.process_index(), jax.process_count()


def shard_contigs(lengths: Sequence[int], num_shards: int
                  ) -> List[List[int]]:
    """Size-balanced greedy contig assignment (longest-first onto the
    lightest shard).  Deterministic across hosts."""
    order = np.argsort([-int(x) for x in lengths], kind="stable")
    loads = [0] * num_shards
    shards: List[List[int]] = [[] for _ in range(num_shards)]
    for cid in order:
        s = int(np.argmin(loads))
        shards[s].append(int(cid))
        loads[s] += int(lengths[cid])
    for s in shards:
        s.sort()  # keep draft order within a shard (BAM stream order)
    return shards


def shard_contigs_contiguous(lengths: Sequence[int], num_shards: int
                             ) -> List[Tuple[int, int]]:
    """Split contigs into ``num_shards`` contiguous [lo, hi) ranges with
    roughly balanced total length.  Contiguity lets every host stream
    exactly its slice of the draft-contig-sorted BAM (skip to lo, stop
    at hi) with no index.  Deterministic across hosts."""
    total = sum(int(x) for x in lengths)
    n = len(lengths)
    bounds = [0]
    acc = 0
    for s in range(1, num_shards):
        target = total * s / num_shards
        lo = bounds[-1]
        cut = lo
        while cut < n and (acc + lengths[cut] / 2.0) < target:
            acc += int(lengths[cut])
            cut += 1
        # never produce an empty middle shard while contigs remain
        cut = min(max(cut, lo), n)
        bounds.append(cut)
    bounds.append(n)
    return [(bounds[i], bounds[i + 1]) for i in range(num_shards)]


def shard_files(paths: Sequence[str], process_id: int,
                num_processes: int) -> List[str]:
    """Round-robin read-file assignment for distributed k-mer counting."""
    return [p for i, p in enumerate(paths)
            if i % num_processes == process_id]


def merge_histograms_psum(local_hist: np.ndarray) -> np.ndarray:
    """Merge per-host k-mer histograms with one psum over all devices.

    Each host contributes its local histogram once (replicated across
    its local devices would overcount, so the histogram rides on local
    device 0 and zeros elsewhere); the result is identical on every
    host."""
    n_local = jax.local_device_count()
    h = np.asarray(local_hist)
    stacked = np.zeros((n_local,) + h.shape, h.dtype)
    stacked[0] = h
    merged = jax.pmap(lambda x: jax.lax.psum(x, "d"), axis_name="d")(
        jnp.asarray(stacked))
    return np.asarray(merged[0])


def gather_polished_fasta(out_path: str, num_processes: int,
                          process_id: int,
                          draft_order: Sequence[str],
                          timeout_s: float = 3600.0) -> None:
    """Rank-0 filesystem gather: every host writes
    ``{out_path}.shard{pid}`` followed by an empty ``.done`` marker;
    rank 0 waits for all shards and concatenates records back into
    draft order (``draft_order`` = contig names in draft-FASTA order,
    known identically on every host)."""
    import time

    from ..io.fasta import read_fastx, write_fasta
    if process_id != 0:
        return
    shard_paths = [f"{out_path}.shard{p}" for p in range(num_processes)]
    deadline = time.time() + timeout_s
    for p in shard_paths:
        while not os.path.exists(p + ".done"):
            if time.time() > deadline:
                raise TimeoutError(f"shard never arrived: {p}")
            time.sleep(1)
    by_name = {}
    for p in shard_paths:
        for name, seq in read_fastx(p):
            by_name[name.split()[0]] = seq
    missing = [n for n in draft_order if n.split()[0] not in by_name]
    if missing:
        raise RuntimeError(f"gather missing contigs: {missing[:5]}")
    write_fasta(out_path,
                ((n, by_name[n.split()[0]]) for n in draft_order))
