"""Window consensus through the fully on-device POA kernel.

Execution model: windows are classified into at most two fixed shape
classes (short / long), sorted by arm count, and packed into fixed-size
batch tiles.  Each tile's arms stream through the chunked device
programs (hypo_tpu.poa.device_full.build_chunk_programs): the POA state
lives on device between chunk calls (donated buffers), one `finish`
dispatch emits curated, nibble-packed consensus + overflow flags, and
ALL tiles' finish handles are collected only after every dispatch is
enqueued AND the device has drained (block on the last handle before
the first device->host read — a readback while executions are pending
degrades the remote runtime into per-dispatch polling).

This keeps the number of compiled programs at ~3 per shape class
regardless of coverage depth (arm counts) — critical on backends where
each distinct executable costs ~15-25 s to build/load per process.

Windows that overflow the class caps (graph nodes N, arm length L) are
re-run on the host engine (native C++ if available), which is exact;
the device path's tie-breaking is the deterministic column-POA order
documented in hypo_tpu.poa.colpoa_ref.  The reference's analog of this
device engine is its production SIMD engine
(external/spoa/src/simd_alignment_engine.cpp:46-142).
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import ScoreParams
from .batch import DeviceConsensusRunner, _Job
from .engine import CURATE_THRESH
from .jax_poa import GLOBAL_ALPHABET, GLOBAL_CODE

# shape classes: (L arm-length cap, N node/column cap, Kc arms per chunk
# dispatch, B batch tile).  Class 0 covers short-read windows (ideal
# 100 bp, force-divide <~2x, reference WindowSettings globalDefs.hpp:
# 119-156); class 1 covers long pseudo-windows (<=500 bp draft,
# Contig.cpp:292-343) and oversized short windows.  L is chosen so the
# Pallas lane dim L+2 rounds to one 128-lane tile (126 -> 128,
# 510 -> 512).  B must divide by ndev * 8 (the Pallas tile width).
CLASSES: Tuple[Tuple[int, int, int, int], ...] = (
    (126, 256, 8, 2048),
    (510, 1024, 4, 256),
)
P_FULL = 8


def _dedup(seqs) -> List[Tuple[str, int, int]]:
    """Collapse identical (sequence, mode) arms into one weighted entry
    at the first occurrence.  High-accuracy short reads make most arms
    of a window identical, so this cuts device arm rounds ~5x; merging
    one arm with weight w is exactly merging w copies (device_full.
    _merge docstring)."""
    out: Dict[Tuple[str, int], int] = {}
    for s, md in seqs:
        out[(s, md)] = out.get((s, md), 0) + 1
    return [(s, md, w) for (s, md), w in out.items()]

_CODE_LUT = np.zeros(256, np.int8)
for _c, _v in GLOBAL_CODE.items():
    _CODE_LUT[ord(_c)] = _v

_ALPHA_LUT = np.frombuffer(
    "".join(GLOBAL_ALPHABET).encode(), np.uint8).copy()


def _decode(codes: np.ndarray) -> str:
    return _ALPHA_LUT[codes].tobytes().decode()


class FullDeviceRunner(DeviceConsensusRunner):
    """Drop-in alternative to DeviceConsensusRunner: same job model,
    but consensus (incl. long-window curation) runs end-to-end on
    device."""

    def __init__(self, sp: ScoreParams, fix_long_align_type: bool = False,
                 use_native: bool = None):
        super().__init__(sp, fix_long_align_type, use_native)
        import jax
        from .device_full import resolve_dp_impl
        self.dp_impl = resolve_dp_impl("auto")
        self.ndev = jax.local_device_count()
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
                job.ext = _dedup(job.seqs)
                ci = self._class_for(job)
                if ci is None:
                    spawned = self._host_finish(job)
                    if spawned is not None:
                        nxt.append(spawned)
                    continue
                groups.setdefault((ci, job.scores), []).append(job)
            handles = []
            for (ci, scores), grp in sorted(groups.items(),
                                            key=lambda kv: kv[0]):
                B = CLASSES[ci][3]
                grp.sort(key=lambda j: -len(j.ext))
                for lo in range(0, len(grp), B):
                    tile = grp[lo:lo + B]
                    handles.append(
                        (tile, self._dispatch_tile(tile, ci, scores)))
            if handles:
                # drain the device before the first readback
                handles[-1][1].block_until_ready()
            for tile, handle in handles:
                nxt.extend(self._collect_full(tile, handle))
            active = nxt
        return count

    @staticmethod
    def _class_for(job: _Job) -> Optional[int]:
        maxl = max(len(s) for s, _m, _w in job.ext)
        need_n = max(2 * maxl, maxl + 32)
        for ci, (L, N, _Kc, _B) in enumerate(CLASSES):
            if maxl <= L and need_n <= N:
                return ci
        return None

    @staticmethod
    def _curate_threshold(job: _Job) -> int:
        if job.kind == "short":
            return 0
        return math.floor(job.window.num_internal * CURATE_THRESH)

    def _dispatch_tile(self, grp: List[_Job], ci: int, scores):
        """Stream one tile's arms through the chunked programs; returns
        the async finish handle (a single packed int8 array)."""
        from .device_full import build_chunk_programs
        L, N, Kc, B = CLASSES[ci]
        if self.dp_impl != "pallas":
            # CPU/interpret backends: padded windows are real compute
            # and compiles are local, so shrink the tile to fit
            unit = self.ndev * 8
            B = min(B, max(unit, -(-len(grp) // unit) * unit))
        m, n, g = scores
        init, chunk, finish = build_chunk_programs(
            N=N, L=L, Kc=Kc, P=P_FULL, m=m, n=n, g=g, B=B,
            dp_impl=self.dp_impl, ndev=self.ndev)
        st = init()
        kmax = max(len(job.ext) for job in grp)
        for c0 in range(0, kmax, Kc):
            st = chunk(st, *self._pack_chunk(grp, c0, Kc, L, B))
            self.stats["full_dispatches"] += 1
        th = np.zeros(B, np.int32)
        for b, job in enumerate(grp):
            th[b] = self._curate_threshold(job)
        self.stats["full_windows"] += len(grp)
        return finish(st, th)

    @staticmethod
    def _pack_chunk(grp: List[_Job], c0: int, Kc: int, L: int, B: int):
        """Vectorized host packing of deduped arms [c0, c0+Kc) of every
        job into (arms i8 [B,Kc,L], alen i32 [B,Kc], amode i8 [B,Kc],
        aw i32 [B,Kc])."""
        strs: List[str] = []
        flat_k: List[int] = []
        amode = np.zeros((B, Kc), np.int8)
        aw = np.zeros((B, Kc), np.int32)
        for b, job in enumerate(grp):
            hi = min(len(job.ext), c0 + Kc)
            base = b * Kc - c0
            for k in range(c0, hi):
                s, md, w = job.ext[k]
                strs.append(s)
                flat_k.append(base + k)
                amode[b, k - c0] = md
                aw[b, k - c0] = w
        arms = np.zeros((B, Kc, L), np.int8)
        alen = np.zeros((B, Kc), np.int32)
        if strs:
            lens = np.fromiter((len(s) for s in strs), np.int64,
                               len(strs))
            codes = _CODE_LUT[np.frombuffer(
                "".join(strs).encode(), np.uint8)]
            slot = np.asarray(flat_k, np.int64)
            alen.reshape(-1)[slot] = lens
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            within = np.arange(len(codes)) - np.repeat(starts, lens)
            dst = np.repeat(slot * L, lens) + within
            arms.reshape(-1)[dst] = codes
        return arms, alen, amode, aw

    def _collect_full(self, grp: List[_Job], handle) -> List[_Job]:
        packed = np.asarray(handle)           # one transfer
        half = packed.shape[1] - 4
        nib = packed[:, :half].view(np.uint8)
        lo = nib & 0xF
        hi = nib >> 4
        codes = np.empty((packed.shape[0], 2 * half), np.uint8)
        codes[:, 0::2] = lo
        codes[:, 1::2] = hi
        clen = (packed[:, half].view(np.uint8).astype(np.int32)
                | (packed[:, half + 1].view(np.uint8).astype(np.int32)
                   << 8))
        ovf = packed[:, half + 2] != 0
        out: List[_Job] = []
        for b, job in enumerate(grp):
            if ovf[b]:
                self.stats["full_overflows"] += 1
                spawned = self._host_finish(job)
                if spawned is not None:
                    out.append(spawned)
                continue
            spawned = self._finalize_full(job, codes[b, :clen[b]])
            if spawned is not None:
                out.append(spawned)
        return out

    def _finalize_full(self, job: _Job,
                       codes: np.ndarray) -> Optional[_Job]:
        """codes are already curated on device (short: th=0 keeps all)."""
        w = job.window
        cons = _decode(codes)
        if job.kind == "short":
            w.consensus = cons[1:-1]   # strip J/O markers
            return None
        w.consensus = cons
        if job.kind == "long1":
            return self._build_long_job(w, backbone=cons, kind="long2")
        return None
