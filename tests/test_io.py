import gzip

import numpy as np

from hypo_tpu.io import (BamRecord, read_alignments, read_fastx, write_bam,
                         write_fasta, write_sam)
from hypo_tpu.io.bam import parse_cigar


def test_fasta_roundtrip(tmp_path):
    p = tmp_path / "x.fa"
    recs = [("c1", "ACGT" * 10), ("c2 desc", "TTTT")]
    write_fasta(str(p), [("c1", "ACGT" * 10), ("c2", "TTTT")])
    got = list(read_fastx(str(p)))
    assert got == [("c1", "ACGT" * 10), ("c2", "TTTT")]


def test_fasta_gz_multiline(tmp_path):
    p = tmp_path / "x.fa.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(">a desc here\nACGT\nACGT\n>b\nGG\n")
    got = list(read_fastx(str(p)))
    assert got == [("a", "ACGTACGT"), ("b", "GG")]


def test_fastq(tmp_path):
    p = tmp_path / "x.fq"
    p.write_text("@r1 x\nACGT\n+\nIIII\n@r2\nTT\n+\nII\n")
    assert list(read_fastx(str(p))) == [("r1", "ACGT"), ("r2", "TT")]


def _mkrec(qname, tid, pos, cig, seq, flag=0, mapq=60, nm=None):
    ops, lens = parse_cigar(cig)
    from hypo_tpu.dna import encode
    return BamRecord(qname, flag, tid, pos, mapq, ops, lens, encode(seq), nm)


def test_sam_bam_roundtrip(tmp_path):
    refs = [("c1", 100), ("c2", 50)]
    recs = [
        _mkrec("r1", 0, 5, "3S10M2I5M4D10M", "A" * 30, nm=7),
        _mkrec("r2", 1, 0, "25M", "ACGTN" * 5, flag=16),
    ]
    for name, writer in [("x.sam", write_sam), ("x.bam", write_bam)]:
        p = tmp_path / name
        writer(str(p), refs, recs)
        refs2, it = read_alignments(str(p))
        got = list(it)
        assert refs2 == refs
        assert len(got) == 2
        for a, b in zip(recs, got):
            assert a.qname == b.qname
            assert a.flag == b.flag
            assert a.tid == b.tid
            assert a.pos == b.pos
            assert a.mapq == b.mapq
            assert a.cigar_string() == b.cigar_string()
            assert np.array_equal(a.seq_codes, b.seq_codes)
            assert a.nm == b.nm


def test_bam_large_stream(tmp_path):
    # exceed one BGZF block to exercise the block splitter
    refs = [("c1", 10_000)]
    recs = [_mkrec(f"r{i}", 0, i % 1000, "150M", "ACGT" * 37 + "AC", nm=i % 5)
            for i in range(1500)]
    p = tmp_path / "big.bam"
    write_bam(str(p), refs, recs)
    _, it = read_alignments(str(p))
    got = list(it)
    assert len(got) == 1500
    assert got[-1].qname == "r1499"
    assert got[-1].nm == 1499 % 5
