"""Window consensus through the fully on-device POA kernel.

One device dispatch per (bucket, score-set) handles every arm of every
window in the bucket — DP, merge, topo maintenance and heaviest-bundle
consensus all happen in the kernel (hypo_tpu.poa.device_full), so the
host<->device traffic is one upload of packed arms and one download of
consensus codes per bucket, instead of one round trip per arm round
(the DeviceConsensusRunner's model, which is latency-bound on real
links).

Windows that overflow the bucket's fixed caps (graph nodes N, arm
length L, arm count K, predecessors P) are re-run on the host engine
(native C++ if available), which is exact; the device path's
tie-breaking is the deterministic column-POA order documented in
hypo_tpu.poa.colpoa_ref.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import ScoreParams
from .batch import DeviceConsensusRunner, _cap_for, _Job
from .engine import CURATE_THRESH
from .jax_poa import GLOBAL_ALPHABET, encode_global

L_CAPS = (64, 128, 256, 512, 1024)
K_CAPS = (8, 16, 32, 64, 128)
N_CAPS = (64, 128, 256, 512, 1024, 2048)
P_FULL = 8
# below this many windows, a bucket is merged into a larger one rather
# than paying its own dispatch round trip
MIN_GROUP = 64
# split very large buckets to bound device memory per dispatch
MAX_GROUP = 4096


def _decode(codes: np.ndarray) -> str:
    return "".join(GLOBAL_ALPHABET[c] for c in codes)


class FullDeviceRunner(DeviceConsensusRunner):
    """Drop-in alternative to DeviceConsensusRunner: same job model,
    but consensus runs end-to-end on device."""

    def __init__(self, sp: ScoreParams, fix_long_align_type: bool = False,
                 use_native: bool = None):
        super().__init__(sp, fix_long_align_type, use_native)
        self.stats.update({"full_dispatches": 0, "full_windows": 0,
                           "full_overflows": 0})

    def run_windows(self, windows) -> int:
        jobs: List[_Job] = []
        count = 0
        for w in windows:
            if w is None:
                continue
            count += 1
            j = self._build_job(w)
            if j is not None:
                jobs.append(j)
        active = jobs
        while active:
            nxt: List[_Job] = []
            groups: Dict[tuple, List[_Job]] = {}
            for job in active:
                maxl = max(len(s) for s, _m in job.seqs)
                lcap = _cap_for(maxl, L_CAPS)
                kcap = _cap_for(len(job.seqs), K_CAPS)
                ncap = _cap_for(max(2 * maxl, maxl + 32), N_CAPS)
                if lcap is None or kcap is None or ncap is None:
                    spawned = self._host_finish(job)
                    if spawned is not None:
                        nxt.append(spawned)
                    continue
                groups.setdefault((job.scores, ncap, lcap, kcap),
                                  []).append(job)
            # dispatch all buckets asynchronously, then collect — the
            # device pipelines the compute while the host packs the next
            # bucket, and each bucket costs one upload + one download
            handles = []
            for (scores, ncap, lcap, kcap), grp in \
                    self._plan_buckets(groups):
                for lo in range(0, len(grp), MAX_GROUP):
                    part = grp[lo:lo + MAX_GROUP]
                    handles.append(
                        (part, self._dispatch_full(part, scores, ncap,
                                                   lcap, kcap)))
            for part, handle in handles:
                nxt.extend(self._collect_full(part, handle))
            active = nxt
        return count

    @staticmethod
    def _plan_buckets(groups: Dict[tuple, List[_Job]]):
        """Keep large buckets as-is; pool every small bucket of the same
        score set into one max-caps bucket — a dispatch round trip costs
        far more than padded compute for a few dozen windows."""
        misc: Dict[tuple, Tuple[list, List[_Job]]] = {}
        for (scores, ncap, lcap, kcap), grp in groups.items():
            if len(grp) >= MIN_GROUP:
                yield (scores, ncap, lcap, kcap), grp
                continue
            caps, members = misc.setdefault(scores, ([0, 0, 0], []))
            caps[0] = max(caps[0], ncap)
            caps[1] = max(caps[1], lcap)
            caps[2] = max(caps[2], kcap)
            members.extend(grp)
        for scores, (caps, members) in misc.items():
            yield (scores, caps[0], caps[1], caps[2]), members

    def _dispatch_full(self, grp: List[_Job], scores, N: int, L: int,
                       K: int):
        """Pack a bucket and launch the kernel; returns the async device
        handle (a single packed int32 array)."""
        from .device_full import poa_full_batch_packed
        B = len(grp)
        Bp = 1 << max(0, (B - 1).bit_length())
        arms = np.zeros((Bp, K, L), np.int32)
        alen = np.zeros((Bp, K), np.int32)
        amode = np.zeros((Bp, K), np.int32)
        narms = np.zeros(Bp, np.int32)
        for b, job in enumerate(grp):
            narms[b] = len(job.seqs)
            for k, (s, md) in enumerate(job.seqs):
                codes = encode_global(s)
                arms[b, k, :len(codes)] = codes
                alen[b, k] = len(codes)
                amode[b, k] = md
        m, n, g = scores
        self.stats["full_dispatches"] += 1
        self.stats["full_windows"] += B
        return poa_full_batch_packed(
            arms, alen, amode, narms, N=N, L=L, K=K, P=P_FULL,
            m=m, n=n, g=g)

    def _collect_full(self, grp: List[_Job], handle) -> List[_Job]:
        packed = np.asarray(handle)           # one transfer
        N = (packed.shape[1] - 2) // 2
        cc = packed[:, :N]
        cs = packed[:, N:2 * N]
        cl = packed[:, 2 * N]
        ovf = packed[:, 2 * N + 1] != 0
        out: List[_Job] = []
        for b, job in enumerate(grp):
            if ovf[b]:
                self.stats["full_overflows"] += 1
                spawned = self._host_finish(job)
                if spawned is not None:
                    out.append(spawned)
                continue
            codes = cc[b, :cl[b]]
            sup = cs[b, :cl[b]]
            spawned = self._finalize_full(job, codes, sup)
            if spawned is not None:
                out.append(spawned)
        return out

    def _finalize_full(self, job: _Job, codes: np.ndarray,
                       sup: np.ndarray) -> Optional[_Job]:
        w = job.window
        cons = _decode(codes)
        if job.kind == "short":
            w.consensus = cons[1:-1]   # strip J/O markers
            return None
        th = math.floor(w.num_internal * CURATE_THRESH)
        curated = "".join(c for c, d in zip(cons, sup) if d >= th)
        w.consensus = curated
        if job.kind == "long1":
            return self._build_long_job(w, backbone=curated, kind="long2")
        return None
