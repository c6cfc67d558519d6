"""Measure whether LONG pseudo-windows are worth a device tile class.

Runs the pipeline on a hybrid (short+long) dataset and, for every LONG
window that reaches consensus, records the device-tile viability of its
round-1 job: arm count BEFORE dedup, distinct (seq, mode) count AFTER
dedup (the device pool cost), max sequence length, and whether it fits
the long tile class caps (L=510, N=1024, K=16 — poa.full_runner.CLASSES
class 1).  This is the measurement VERDICT round 3 asked for to decide
the long-window device story (host-long vs wiring class 1 into
production).

Usage: python tools/long_window_stats.py <sim_dir>
"""
import sys

import numpy as np

sys.path.insert(0, ".")


def main(sim: str) -> None:
    from hypo_tpu.config import InputFlags, get_kmer_len
    from hypo_tpu.pipeline.polish import Polisher
    from hypo_tpu.poa import engine as eng_mod
    from hypo_tpu.poa.batch import DeviceConsensusRunner
    from hypo_tpu.poa.full_runner import CLASSES, _dedup
    from hypo_tpu.config import ScoreParams

    L1, N1, K1, _B1, _A1 = CLASSES[1]
    stats = []
    builder = DeviceConsensusRunner(ScoreParams())
    orig = eng_mod.ConsensusEngine.generate_consensus_batch

    def spy(self, windows, nthreads=0):
        for w in windows:
            if getattr(w, "wtype", 0) == 0:
                continue
            raw = (w.num_internal + w.num_pre + w.num_suf)
            job = builder._build_long_job(
                w, backbone="".join("ACGT"[c] for c in w.draft),
                kind="long1")
            if job is None:
                stats.append((raw, 0, 0, len(w.draft), True, "no-job"))
                continue
            ext = _dedup(job.seqs)
            maxl = max(len(s) for s, _m, _w in ext)
            need_n = max(2 * maxl, maxl + 32)
            fits = (maxl <= L1 and need_n <= N1 and len(ext) <= K1)
            stats.append((raw, len(ext), maxl, len(w.draft), fits, ""))
        return orig(self, windows, nthreads)

    eng_mod.ConsensusEngine.generate_consensus_batch = spy
    flags = InputFlags(
        sr_filenames=[f"{sim}/reads.fq.gz"],
        sr_bam_filename=f"{sim}/sr.bam",
        lr_bam_filename=f"{sim}/lr.bam",
        draft_filename=f"{sim}/draft.fa",
        output_filename="/tmp/longstats_out.fa",
        k=max(2, get_kmer_len("2m")),
        cov=30,
        threads=2,
    )
    Polisher(flags).polish()
    eng_mod.ConsensusEngine.generate_consensus_batch = orig

    if not stats:
        print("NO long windows reached consensus")
        return
    raw = np.array([s[0] for s in stats])
    ded = np.array([s[1] for s in stats])
    maxl = np.array([s[2] for s in stats])
    dlen = np.array([s[3] for s in stats])
    fits = np.array([s[4] for s in stats])
    print(f"long windows: {len(stats)}")
    print(f"raw arms       p50={np.median(raw):.0f} "
          f"p90={np.percentile(raw, 90):.0f} max={raw.max()}")
    print(f"dedup ext      p50={np.median(ded):.0f} "
          f"p90={np.percentile(ded, 90):.0f} max={ded.max()} "
          f"(K cap {K1})")
    print(f"dedup ratio    {ded.sum() / max(raw.sum(), 1):.2f} "
          f"(1.0 = no dedup benefit)")
    print(f"max seq len    p50={np.median(maxl):.0f} "
          f"p90={np.percentile(maxl, 90):.0f} max={maxl.max()} "
          f"(L cap {L1})")
    print(f"draft len      p50={np.median(dlen):.0f} max={dlen.max()}")
    print(f"fits class 1   {fits.mean() * 100:.1f}% "
          f"({fits.sum()}/{len(fits)})")
    over_k = (ded > K1).mean() * 100
    over_l = (maxl > L1).mean() * 100
    print(f"over K cap     {over_k:.1f}%   over L cap {over_l:.1f}%")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sim2m_hyb")
