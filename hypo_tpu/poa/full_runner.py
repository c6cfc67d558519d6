"""Window consensus through the fully on-device POA kernel.

Execution model:

1. TRIVIAL windows exit immediately on the host: after deduplication,
   a window whose arms are ALL identical (the majority at short-read
   coverage — the median window deduplicates to ONE distinct arm) has
   that arm as its exact consensus (a single-sequence POA graph is a
   chain; the heaviest bundle is the whole chain, and every base's
   support is the total arm count, which is always >= the curate
   threshold).  No POA runs at all.
2. Remaining windows are classified into at most two fixed shape
   classes (short / long), sorted by (distinct-arm count, arm length),
   and packed into fixed-size batch tiles.  Each tile is ONE device
   dispatch (hypo_tpu.poa.device_full.build_tile_program): the arm
   dimension is a device-side loop bounded by the tile's real arm
   count, and arms live in a per-tile deduplicated POOL (identical
   arms recur across windows) uploaded once.
3. ALL tiles are dispatched before the FIRST readback: on remote/
   tunneled TPU runtimes the first device->host read drops the stream
   into synchronous per-dispatch mode, so the dispatch and readback
   phases must not interleave.

Windows that overflow the class caps (graph nodes N, arm length L,
K distinct arms) are re-run on the host engine (native C++ if
available), which is exact; the device path's tie-breaking is the
deterministic column-POA order documented in hypo_tpu.poa.colpoa_ref.
The reference's analog of this device engine is its production SIMD
engine (external/spoa/src/simd_alignment_engine.cpp:46-142).
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import ScoreParams
from .batch import DeviceConsensusRunner, _Job
from .engine import CURATE_THRESH
from .jax_poa import GLOBAL_ALPHABET, GLOBAL_CODE, NW

# shape classes: (L arm-length cap, N node/column cap, K distinct-arm
# cap, B batch tile, A arm-pool cap).  Class 0 covers short-read
# windows (ideal 100 bp, force-divide <~2x, reference WindowSettings
# globalDefs.hpp:119-156); class 1 covers long pseudo-windows (<=500 bp
# draft, Contig.cpp:292-343) and oversized short windows.  L is chosen
# so the Pallas lane dim L+2 rounds to one 128-lane tile.
CLASSES: Tuple[Tuple[int, int, int, int, int], ...] = (
    (126, 256, 16, 2048, 4096),
    (510, 1024, 16, 256, 512),
)
P_FULL = 8


def _dedup(seqs) -> List[Tuple[str, int, int]]:
    """Collapse identical (sequence, mode) arms into one weighted entry
    at the first occurrence.  High-accuracy short reads make most arms
    of a window identical; merging one arm with weight w is exactly
    merging w copies (device_full._merge docstring)."""
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
                 use_native: bool = None, threads: int = 0):
        super().__init__(sp, fix_long_align_type, use_native)
        import jax
        from .device_full import resolve_dp_impl
        self.dp_impl = resolve_dp_impl("auto")
        self.ndev = jax.local_device_count()
        self.threads = threads
        self._aot_cache = {}
        # long pseudo-windows (wtype != 0) run on the host native
        # engine BY DESIGN, measured (tools/long_window_stats.py on a
        # 2 Mbp hybrid sim at 25x long coverage, 657 LONG windows):
        # dedup ratio 1.06 (noisy long arms never deduplicate, so the
        # device loses its weighted-dedup advantage), median 16 raw
        # arms per window (5-8x more sequential device arm steps than a
        # short window), 58% exceed the K=16 distinct-arm cap and only
        # 39% fit tile class 1 at all — the device tile would mostly
        # host-fallback after paying full tile cost.  The reference
        # polishes long windows through the same engine as short ones
        # (Window.cpp:156-236); our split is a deliberate divergence.
        from .engine import ConsensusEngine
        self.host_engine = ConsensusEngine(sp, fix_long_align_type,
                                           use_native)
        import os
        if os.environ.get("HYPO_POA_NDEV"):
            self.ndev = int(os.environ["HYPO_POA_NDEV"])
        self.stats.update({"full_dispatches": 0, "full_windows": 0,
                           "full_overflows": 0, "trivial_windows": 0,
                           "host_long_windows": 0,
                           "rows_per_device": np.zeros(max(self.ndev, 1),
                                                       np.int64)})

    # -- program warm-up ----------------------------------------------------
    def warm(self, classes=(0,), wait: bool = False):
        """Compile/load the tile program(s) in a background thread so
        the (10-30 s cold / ~2 s cached) executable build overlaps the
        pipeline's host-side stages.  The program is INVOKED once on a
        zero tile — jax.jit compiles (or loads from the persistent
        cache) only at the first call, so merely building the callable
        would leave the multi-second load inside the first real
        dispatch.  Returns the thread."""
        import threading

        def _build():
            for ci in classes:
                try:
                    fn = self._program(ci, self.short_scores)
                    L, N, K, B, A = self._class_shape(ci)
                    import jax
                    jax.block_until_ready(fn(
                        np.zeros((A, L), np.int8), np.zeros(A, np.int32),
                        np.full((B, K), -1, np.int32),
                        np.zeros((B, K), np.int8),
                        np.zeros((B, K), np.int32), np.zeros(B, np.int32),
                        np.zeros(B, np.int32)))
                except Exception:
                    pass

        t = threading.Thread(target=_build, daemon=True)
        t.start()
        if wait:
            t.join()
        return t

    def _program(self, ci: int, scores):
        L, N, K, B, A = self._class_shape(ci)
        m, n, g = scores
        params = dict(N=N, L=L, K=K, P=P_FULL, m=m, n=n, g=g, B=B, A=A,
                      dp_impl=self.dp_impl, ndev=self.ndev)
        if self.dp_impl == "pallas" and self.ndev == 1:
            # never trace/compile in the pipeline process (45-80 s on
            # the tunneled runtime, and the JIT cache key is perturbed
            # by concurrent tracing) — load the AOT executable, falling
            # back to one compile+persist if the artifact is absent
            key = tuple(sorted(params.items()))
            prog = self._aot_cache.get(key)
            if prog is None:
                from . import aot
                prog = aot.get_tile_program(params)
                self._aot_cache[key] = prog
            return prog
        from .device_full import build_tile_program
        return build_tile_program(**params)

    def _class_shape(self, ci: int):
        L, N, K, B, A = CLASSES[ci]
        if self.dp_impl != "pallas":
            # CPU/interpret backends: padded windows are real compute
            # and compiles are local, so shrink the tile
            B = max(8 * self.ndev, 64)
            A = 2 * B * K
        return L, N, K, B, A

    # -- job classification --------------------------------------------------
    @staticmethod
    def _trivial(job: _Job) -> bool:
        """One distinct (arm, NW) => consensus is that arm, exactly
        (single-sequence chain graph; support = total weight >= any
        curate threshold)."""
        return len(job.ext) == 1 and job.ext[0][1] == NW

    def _finish_trivial(self, job: _Job) -> Optional[_Job]:
        s = job.ext[0][0]
        w = job.window
        if job.kind == "short":
            w.consensus = s[1:-1]   # strip J/O markers (th = 0)
            return None
        # long windows curate at floor(0.4 * num_internal); every base's
        # support is the total arm weight, so it is all-or-nothing
        curated = s if job.ext[0][2] >= self._curate_threshold(job) else ""
        w.consensus = curated
        if job.kind == "long1":
            return self._build_long_job(w, backbone=curated, kind="long2")
        return None

    def _class_for(self, job: _Job) -> Optional[int]:
        if len(job.ext) > CLASSES[-1][2]:
            return None
        maxl = max(len(s) for s, _m, _w in job.ext)
        need_n = max(2 * maxl, maxl + 32)
        for ci, (L, N, K, _B, _A) in enumerate(CLASSES):
            if maxl <= L and need_n <= N and len(job.ext) <= K:
                return ci
        return None

    @staticmethod
    def _curate_threshold(job: _Job) -> int:
        if job.kind == "short":
            return 0
        return math.floor(job.window.num_internal * CURATE_THRESH)

    # -- main loop ------------------------------------------------------------
    def run_windows(self, windows) -> int:
        import os
        import time
        debug = bool(os.environ.get("HYPO_POA_DEBUG"))
        t0 = time.time()
        jobs: List[_Job] = []
        host_long = []
        count = 0
        for w in windows:
            if w is None:
                continue
            count += 1
            if w.wtype != 0:
                host_long.append(w)
                continue
            non_empty = w.num_internal + w.num_pre + w.num_suf
            if (w.wtype == 0 and w.num_empty <= non_empty
                    and non_empty >= 2):
                # identical-arm shortcut BEFORE decoding/dedup — the
                # majority case; same condition _trivial would find
                tc = self.host_engine._trivial_consensus(w)
                if tc is not None:
                    w.consensus = tc
                    self.stats["trivial_windows"] += 1
                    continue
            j = self._build_job(w)
            if j is not None:
                jobs.append(j)
        if host_long:
            self.stats["host_long_windows"] += len(host_long)
            self.host_engine.generate_consensus_batch(host_long,
                                                      self.threads)
        if debug:
            print(f"[poa] build jobs: {time.time()-t0:.2f}s "
                  f"({len(jobs)} jobs, {len(host_long)} host long)",
                  flush=True)
        active = jobs
        wave = 0
        while active:
            t0 = time.time()
            nxt: List[_Job] = []
            groups: Dict[tuple, List[_Job]] = {}
            for job in active:
                job.ext = _dedup(job.seqs)
                if self._trivial(job):
                    self.stats["trivial_windows"] += 1
                    spawned = self._finish_trivial(job)
                    if spawned is not None:
                        nxt.append(spawned)
                    continue
                ci = self._class_for(job)
                if ci is None:
                    spawned = self._host_finish(job)
                    if spawned is not None:
                        nxt.append(spawned)
                    continue
                groups.setdefault((ci, job.scores), []).append(job)
            if debug:
                ng = sum(len(g) for g in groups.values())
                print(f"[poa] wave {wave}: classify {time.time()-t0:.2f}s"
                      f" ({ng} device jobs)", flush=True)
            t0 = time.time()
            handles = []
            for (ci, scores), grp in sorted(groups.items(),
                                            key=lambda kv: kv[0]):
                grp.sort(key=lambda j: (-len(j.ext),
                                        -max(len(s) for s, _m, _w
                                             in j.ext)))
                lo = 0
                while lo < len(grp):
                    tile, hi = self._take_tile(grp, lo, ci)
                    handles.append(
                        (tile, self._dispatch_tile(tile, ci, scores)))
                    lo = hi
            if debug:
                print(f"[poa] wave {wave}: pack+dispatch "
                      f"{time.time()-t0:.2f}s ({len(handles)} tiles)",
                      flush=True)
            # drain the device before the first readback, then read
            # every tile (no dispatches in between)
            t0 = time.time()
            if handles:
                import jax
                jax.block_until_ready(handles[-1][1])
            if debug:
                print(f"[poa] wave {wave}: device drain "
                      f"{time.time()-t0:.2f}s", flush=True)
            t0 = time.time()
            for tile, handle in handles:
                nxt.extend(self._collect_full(tile, handle))
            if debug:
                print(f"[poa] wave {wave}: readback+finalize "
                      f"{time.time()-t0:.2f}s  stats={self.stats}",
                      flush=True)
            active = nxt
            wave += 1
        return count

    # -- native tile fast path ---------------------------------------------
    # The host side of the device engine without per-window Python work:
    # job building / dedup / trivial settling, tile packing, and output
    # unpacking all run in C (hypo_tile_jobs/_pack/_finalize in
    # host_native.cpp); Python only orchestrates dispatches and assigns
    # the finished consensus strings.  Requires contigs prepared with
    # counters-only window fill (Contig.add_arm_table_counts) carrying
    # ``_device_arm_data = (table, abuf, aoff)``.

    @staticmethod
    def supports_native_tiles() -> bool:
        from ..native import host_api
        return host_api.available()

    def run_polish_batch(self, contigs) -> int:
        import os
        import time
        from ..native import host_api
        debug = bool(os.environ.get("HYPO_POA_DEBUG"))
        t0 = time.time()
        count = 0
        host_windows = []          # LONG windows (host engine, as-is)
        fallback = []              # (ctg, wi) needing arm materialization
        merged: List[host_api.TileJobs] = []
        job_refs: List = []        # Window object per merged job
        for ctg in contigs:
            table, abuf, aoff = ctg._device_arm_data
            windows = ctg.windows
            n_reg = len(ctg.reg_starts) - 1
            wflag = np.zeros(n_reg, np.uint8)
            presuf = np.zeros(n_reg, np.uint8)
            for i in range(n_reg):
                w = windows[i]
                if w is None:
                    continue
                count += 1
                if w.wtype != 0:
                    host_windows.append(w)
                    continue
                wflag[i] = 1
                presuf[i] = 1 if (w.num_pre > 0 or w.num_suf > 0) else 0
            jobs = host_api.tile_jobs(ctg.codes, ctg.reg_starts, wflag,
                                      presuf, table, abuf, aoff)
            # direct consensus (dispatch rules + trivial windows)
            consbuf = jobs.cons_buf.tobytes().decode("latin1")
            direct = np.nonzero(jobs.flag == 1)[0]
            off = jobs.cons_off
            for i in direct:
                windows[i].consensus = consbuf[off[i]:off[i + 1]]
            self.stats["trivial_windows"] += len(direct)
            for i in np.nonzero(jobs.flag == 3)[0]:
                fallback.append((ctg, int(i)))
            for j in range(jobs.n_jobs):
                job_refs.append((ctg, int(jobs.job_windex[j])))
            merged.append(jobs)
        nj = sum(j.n_jobs for j in merged)
        if debug:
            print(f"[poa] native jobs: {time.time()-t0:.2f}s "
                  f"({nj} jobs, {len(host_windows)} host long, "
                  f"{len(fallback)} pre-fallbacks)", flush=True)
        t0 = time.time()
        handles = []
        if nj:
            jobs = self._merge_jobs(merged)
            job_th = np.zeros(nj, np.int32)   # short windows: keep all
            need_n = np.maximum(2 * jobs.job_maxlen,
                                jobs.job_maxlen + 32)
            cls = np.full(nj, -1, np.int64)
            for ci, (L, N, K, _B, _A) in enumerate(CLASSES):
                ok = ((cls < 0) & (jobs.job_maxlen <= L)
                      & (need_n <= N) & (jobs.job_next <= K))
                cls[ok] = ci
            for j in np.nonzero(cls < 0)[0]:
                fallback.append(job_refs[j])
            for ci in range(len(CLASSES)):
                idx = np.nonzero(cls == ci)[0]
                if not len(idx):
                    continue
                order = idx[np.lexsort((-jobs.job_maxlen[idx],
                                        -jobs.job_next[idx]))]
                order = np.ascontiguousarray(order, np.int64)
                L, N, K, B, A = self._class_shape(ci)
                tile_fn = self._program(ci, self.short_scores)
                lo = 0
                while lo < len(order):
                    hi, pool, plen, idxt, amode, aw, narms, th, row_of \
                        = host_api.tile_pack(order, lo, jobs, job_th,
                                             B, K, A, L, self.ndev)
                    handle = tile_fn(pool, plen, idxt, amode, aw,
                                     narms, th)
                    handles.append((handle, order, lo, hi, row_of, ci))
                    self.stats["full_dispatches"] += 1
                    self.stats["full_windows"] += hi - lo
                    if self.ndev > 1:
                        blk = B // self.ndev
                        self.stats["rows_per_device"] += np.bincount(
                            row_of[:hi - lo] // blk,
                            minlength=self.ndev)
                    lo = hi
        if debug:
            print(f"[poa] pack+dispatch: {time.time()-t0:.2f}s "
                  f"({len(handles)} tiles)", flush=True)
        t0 = time.time()
        # On tunneled runtimes EVERY device->host read costs ~1 s of
        # polling; at scale there are hundreds of tiles, so per-tile
        # readbacks dominate the whole stage.  Concatenate tile outputs
        # on device into fixed-size chunks (fixed so the concat program
        # compiles once) BEFORE the first read — hundreds of reads
        # become a handful, each at full transfer bandwidth.
        CHUNK = 64
        chunk_of = {}        # handle index -> (chunk key, slot)
        chunks = {}          # chunk key -> device array [<=CHUNK*B, R]
        if handles:
            import jax
            import jax.numpy as jnp
            by_ci: Dict[int, List[int]] = {}
            for i, h in enumerate(handles):
                by_ci.setdefault(h[5], []).append(i)
            for ci, idxs in by_ci.items():
                cat_fn = None
                if (len(idxs) > 1 and self.dp_impl == "pallas"
                        and self.ndev == 1):
                    # AOT concat: the in-pipeline trace would race other
                    # threads, miss the JIT cache and compile for
                    # minutes on a loaded host
                    from . import aot
                    _L, N, _K, B, _A = self._class_shape(ci)
                    cat_fn = aot.get_concat_program(B, N // 2 + 4,
                                                    CHUNK)
                for c0 in range(0, len(idxs), CHUNK):
                    grp = idxs[c0:c0 + CHUNK]
                    hs = [handles[i][0] for i in grp]
                    # pad with the last handle so the concat program
                    # compiles once per (class, CHUNK)
                    if len(idxs) <= 1:
                        cat = hs[0]
                    else:
                        pad = hs + [hs[-1]] * (CHUNK - len(hs))
                        cat = (cat_fn(*pad) if cat_fn is not None
                               else jnp.concatenate(pad, axis=0))
                    key = (ci, c0)
                    chunks[key] = cat
                    for slot, i in enumerate(grp):
                        chunk_of[i] = (key, slot)
            jax.block_until_ready(next(iter(chunks.values())))
        cur_key, cur_arr = None, None
        for i, (handle, order, lo, hi, row_of, ci) in enumerate(handles):
            key, slot = chunk_of[i]
            if key != cur_key:
                cur_key, cur_arr = key, np.asarray(chunks[key])
                chunks[key] = None   # free device memory as we go
            Bt = self._class_shape(ci)[3]
            packed = (cur_arr[slot * Bt:(slot + 1) * Bt]
                      if cur_arr.shape[0] > Bt else cur_arr)
            cnt = hi - lo
            _L, N, _K, _B, _A = self._class_shape(ci)
            out, out_len = host_api.tile_finalize(
                packed, row_of[:cnt], cnt, 0, N)
            for t in range(cnt):
                ctg, wi = job_refs[order[lo + t]]
                if out_len[t] < 0:
                    self.stats["full_overflows"] += 1
                    fallback.append((ctg, wi))
                else:
                    ctg.windows[wi].consensus = \
                        out[t, :out_len[t]].tobytes().decode("latin1")
        if debug:
            print(f"[poa] readback+finalize: {time.time()-t0:.2f}s "
                  f"stats={self.stats}", flush=True)
        # host-engine leftovers: LONG windows (arms already
        # materialized) + fallbacks (arms rebuilt from the flat table,
        # bulk per contig — a per-window table scan is O(rows) each and
        # stalls for minutes at 20M rows)
        t0 = time.time()
        by_ctg: Dict[int, List[int]] = {}
        ctg_of = {}
        for ctg, wi in fallback:
            by_ctg.setdefault(id(ctg), []).append(wi)
            ctg_of[id(ctg)] = ctg
        for key, wis in by_ctg.items():
            ctg = ctg_of[key]
            self._materialize_arms_bulk(ctg, wis)
            host_windows.extend(ctg.windows[wi] for wi in wis)
        if host_windows:
            self.stats["host_long_windows"] += len(host_windows)
            self.host_engine.generate_consensus_batch(host_windows,
                                                      self.threads)
        if debug and (fallback or host_windows):
            print(f"[poa] host leftovers: {time.time()-t0:.2f}s "
                  f"({len(fallback)} fallbacks)", flush=True)
        return count

    def _merge_jobs(self, parts):
        from .host_runner import merge_tile_jobs
        return merge_tile_jobs(parts)

    @staticmethod
    def _materialize_arms_bulk(ctg, wis: List[int]) -> None:
        from .host_runner import materialize_arms_bulk
        materialize_arms_bulk(ctg, wis)

    def _take_tile(self, grp: List[_Job], lo: int, ci: int):
        """Take as many jobs from grp[lo:] as fit one tile's window and
        arm-pool capacities."""
        L, N, K, B, A = self._class_shape(ci)
        pool_used = 0
        seen: Dict[str, int] = {}
        hi = lo
        while hi < len(grp) and hi - lo < B:
            need = sum(1 for s, _m, _w in grp[hi].ext if s not in seen)
            if pool_used + need > A:
                break
            for s, _m, _w in grp[hi].ext:
                if s not in seen:
                    seen[s] = pool_used
                    pool_used += 1
            hi += 1
        return grp[lo:hi], hi

    def _dispatch_tile(self, grp: List[_Job], ci: int, scores):
        """Pack one tile (deduplicated arm pool + per-window index
        table) and dispatch it; returns the async packed handle."""
        L, N, K, B, A = self._class_shape(ci)
        tile_fn = self._program(ci, scores)
        pool_idx: Dict[str, int] = {}
        strs: List[str] = []
        idxt = np.full((B, K), -1, np.int32)
        amode = np.zeros((B, K), np.int8)
        aw = np.zeros((B, K), np.int32)
        narms = np.zeros(B, np.int32)
        th = np.zeros(B, np.int32)
        # stripe jobs across shard blocks so multi-device shards see a
        # balanced arm-count mix (rows of one shard are contiguous)
        rows = self._row_order(len(grp), B)
        for j, job in enumerate(grp):
            b = rows[j]
            narms[b] = len(job.ext)
            th[b] = self._curate_threshold(job)
            for k, (s, md, w) in enumerate(job.ext):
                r = pool_idx.get(s)
                if r is None:
                    r = pool_idx[s] = len(strs)
                    strs.append(s)
                idxt[b, k] = r
                amode[b, k] = md
                aw[b, k] = w
        pool = np.zeros((A, L), np.int8)
        plen = np.zeros(A, np.int32)
        if strs:
            lens = np.fromiter((len(s) for s in strs), np.int64,
                               len(strs))
            codes = _CODE_LUT[np.frombuffer(
                "".join(strs).encode(), np.uint8)]
            plen[:len(strs)] = lens
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            within = np.arange(len(codes)) - np.repeat(starts, lens)
            dst = np.repeat(np.arange(len(strs)) * L, lens) + within
            pool.reshape(-1)[dst] = codes
        self.stats["full_dispatches"] += 1
        self.stats["full_windows"] += len(grp)
        handle = tile_fn(pool, plen, idxt, amode, aw, narms, th)
        return (handle, rows)

    def _row_order(self, n: int, B: int) -> np.ndarray:
        nd = self.ndev
        if nd <= 1:
            return np.arange(n, dtype=np.int64)
        blk = B // nd
        i = np.arange(n, dtype=np.int64)
        return (i % nd) * blk + (i // nd)

    def _collect_full(self, grp: List[_Job], handle) -> List[_Job]:
        handle, rows = handle
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
        for j, job in enumerate(grp):
            b = rows[j]
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
