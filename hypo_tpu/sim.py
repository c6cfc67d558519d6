"""Synthetic polishing dataset generator (test/bench support tool).

Generates: a truth genome, an error-laden draft assembly of it, short
(and optionally long) reads sampled from the truth, and coordinate-sorted
BAMs of those reads aligned to the draft — everything the polisher
consumes.  Replaces the reference's reliance on external real datasets
for its smoke tests (it ships none).

Run as a module:  python -m hypo_tpu.sim --out DIR --genome-size 20000
"""
from __future__ import annotations

import argparse
import dataclasses
import gzip
import os
from typing import List, Optional, Tuple

import numpy as np

from .dna import decode, encode, revcomp
from .io.bam import FREVERSE, BamRecord
from .io.bam import write_bam as _write_bam
from .io.fasta import write_fasta
from .utils.alnutil import semiglobal_align


@dataclasses.dataclass
class SimConfig:
    genome_size: int = 20_000
    num_contigs: int = 1
    draft_error_rate: float = 0.01   # SNP+indel rate genome -> draft
    short_cov: int = 30
    short_len: int = 150
    short_err: float = 0.002
    long_cov: int = 0                # 0 = no long reads
    long_len: int = 1200
    long_err: float = 0.08
    # short reads are not sampled inside [dropout_start, dropout_end) of
    # each contig -> forces arm-less windows -> the long-read path
    dropout: Optional[Tuple[float, float]] = None  # fractions of length
    seed: int = 0


def _mutate(rng, codes: np.ndarray, rate: float) -> np.ndarray:
    """Apply SNPs/insertions/deletions at ~rate per base."""
    out: List[int] = []
    i = 0
    n = len(codes)
    while i < n:
        r = rng.random()
        if r < rate:
            kind = rng.integers(0, 3)
            if kind == 0:  # SNP
                out.append((int(codes[i]) + int(rng.integers(1, 4))) % 4)
                i += 1
            elif kind == 1:  # insertion
                out.append(int(rng.integers(0, 4)))
            else:  # deletion
                i += 1
        else:
            out.append(int(codes[i]))
            i += 1
    return np.array(out, dtype=np.uint8)


def _sample_read(rng, genome: np.ndarray, length: int, err: float,
                 dropout=None) -> Tuple[np.ndarray, int, bool]:
    for _ in range(50):
        start = int(rng.integers(0, max(1, len(genome) - length)))
        if dropout is None:
            break
        ds, de = dropout
        if start + length <= ds * len(genome) or start >= de * len(genome):
            break
    read = genome[start:start + length].copy()
    if err > 0:
        read = _mutate(rng, read, err)
    rev = bool(rng.integers(0, 2))
    return read, start, rev


def _align_read(read: np.ndarray, draft: np.ndarray, approx: int,
                pad: int) -> Tuple[int, np.ndarray, np.ndarray, int]:
    lo = max(0, approx - pad)
    hi = min(len(draft), approx + len(read) + pad)
    _score, ops, lens, rstart, nm = semiglobal_align(read, draft[lo:hi])
    return lo + rstart, ops, lens, nm


def simulate(cfg: SimConfig, out_dir: str) -> dict:
    rng = np.random.default_rng(cfg.seed)
    os.makedirs(out_dir, exist_ok=True)
    truths: List[Tuple[str, str]] = []
    drafts: List[Tuple[str, str]] = []
    genomes: List[np.ndarray] = []
    draft_codes: List[np.ndarray] = []
    per_contig = cfg.genome_size // cfg.num_contigs
    for c in range(cfg.num_contigs):
        g = rng.integers(0, 4, size=per_contig).astype(np.uint8)
        d = _mutate(rng, g, cfg.draft_error_rate)
        genomes.append(g)
        draft_codes.append(d)
        truths.append((f"ctg{c}", decode(g)))
        drafts.append((f"ctg{c}", decode(d)))
    write_fasta(os.path.join(out_dir, "truth.fa"), truths)
    write_fasta(os.path.join(out_dir, "draft.fa"), drafts)
    refs = [(n, len(s)) for n, s in drafts]

    def make_reads(cov: int, rlen: int, err: float, prefix: str,
                   pad: int, dropout=None
                   ) -> Tuple[List[BamRecord], List[Tuple[str, str]]]:
        recs: List[BamRecord] = []
        fastas: List[Tuple[str, str]] = []
        for c, g in enumerate(genomes):
            n_reads = (len(g) * cov) // rlen
            for i in range(n_reads):
                read, gstart, rev = _sample_read(rng, g, rlen, err,
                                                 dropout)
                if len(read) == 0:
                    continue
                name = f"{prefix}{c}_{i}"
                fastas.append((name,
                               decode(revcomp(read) if rev else read)))
                # BAM stores the draft-forward orientation
                pos, ops, lens, nm = _align_read(read, draft_codes[c],
                                                 gstart, pad)
                flag = FREVERSE if rev else 0
                recs.append(BamRecord(name, flag, c, pos, 60, ops, lens,
                                      read, nm))
        recs.sort(key=lambda r: (r.tid, r.pos))
        return recs, fastas

    sr_pad = max(30, int(cfg.short_len * 0.2))
    sr_recs, sr_fastas = make_reads(cfg.short_cov, cfg.short_len,
                                    cfg.short_err, "sr", sr_pad,
                                    cfg.dropout)
    with gzip.open(os.path.join(out_dir, "reads.fq.gz"), "wt") as fh:
        for name, seq in sr_fastas:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    _write_bam(os.path.join(out_dir, "sr.bam"), refs, sr_recs)

    out = {
        "truth": os.path.join(out_dir, "truth.fa"),
        "draft": os.path.join(out_dir, "draft.fa"),
        "reads": os.path.join(out_dir, "reads.fq.gz"),
        "sr_bam": os.path.join(out_dir, "sr.bam"),
        "lr_bam": None,
        "genome_size": cfg.genome_size,
        "short_cov": cfg.short_cov,
    }
    if cfg.long_cov > 0:
        lr_pad = max(60, int(cfg.long_len * 0.25))
        lr_recs, _ = make_reads(cfg.long_cov, cfg.long_len, cfg.long_err,
                                "lr", lr_pad)
        _write_bam(os.path.join(out_dir, "lr.bam"), refs, lr_recs)
        out["lr_bam"] = os.path.join(out_dir, "lr.bam")
    return out


def main(argv: Optional[List[str]] = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--genome-size", type=int, default=20_000)
    ap.add_argument("--num-contigs", type=int, default=1)
    ap.add_argument("--short-cov", type=int, default=30)
    ap.add_argument("--long-cov", type=int, default=0)
    ap.add_argument("--draft-error", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    cfg = SimConfig(genome_size=args.genome_size,
                    num_contigs=args.num_contigs,
                    short_cov=args.short_cov, long_cov=args.long_cov,
                    draft_error_rate=args.draft_error, seed=args.seed)
    paths = simulate(cfg, args.out)
    for k, v in paths.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
