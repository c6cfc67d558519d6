import numpy as np
import pytest

from hypo_tpu.config import ScoreParams
from hypo_tpu.dna import encode
from hypo_tpu.poa import Graph, PoaAligner, NW, LOV, ROV
from hypo_tpu.poa.engine import ConsensusEngine
from hypo_tpu.pipeline.window import Window, SHORT, LONG


def poa_consensus(seqs, modes=None, m=5, n=-4, g=-8):
    graph = Graph()
    eng = PoaAligner(m, n, g)
    modes = modes or [NW] * len(seqs)
    for s, mode in zip(seqs, modes):
        graph.add_alignment(eng.align(s, graph, mode), s)
    return graph.generate_consensus()


def test_identical_sequences():
    assert poa_consensus(["ACGTACGT"] * 3) == "ACGTACGT"


def test_majority_snp():
    seqs = ["ACGTACGTAC", "ACGTACGTAC", "ACGTTCGTAC"]
    assert poa_consensus(seqs) == "ACGTACGTAC"


def test_majority_insertion_deletion():
    seqs = ["ACGTAACGT", "ACGTAACGT", "ACGTACGT"]
    assert poa_consensus(seqs) == "ACGTAACGT"
    seqs = ["ACGTCGT", "ACGTCGT", "ACGTACGT"]
    assert poa_consensus(seqs) == "ACGTCGT"


def test_lov_prefix_alignment():
    # LOV: global start, free end row -> a prefix arm should not be
    # forced to stretch across the whole backbone
    backbone = "JACGTACGTACGTO"
    prefix = "JACGTAC"
    graph = Graph()
    eng = PoaAligner(5, -4, -8)
    a1 = eng.align(backbone, graph, NW)
    graph.add_alignment(a1, backbone)
    a2 = eng.align(prefix, graph, LOV)
    # every aligned pair should be a match on the existing backbone nodes
    matched = [(i, j) for i, j in a2 if i != -1 and j != -1]
    assert len(matched) == len(prefix)
    graph.add_alignment(a2, prefix)
    assert graph.generate_consensus() == backbone


def test_rov_suffix_alignment():
    backbone = "JACGTACGTACGTO"
    suffix = "GTACGTO"
    graph = Graph()
    eng = PoaAligner(5, -4, -8)
    graph.add_alignment(eng.align(backbone, graph, NW), backbone)
    a2 = eng.align(suffix, graph, ROV)
    matched = [(i, j) for i, j in a2 if i != -1 and j != -1]
    assert len(matched) == len(suffix)
    graph.add_alignment(a2, suffix)
    assert graph.generate_consensus() == backbone


def test_msa_columns():
    graph = Graph()
    eng = PoaAligner(5, -4, -8)
    for s in ["ACGT", "AGGT"]:
        graph.add_alignment(eng.align(s, graph, NW), s)
    msa = graph.generate_msa()
    assert msa == ["ACGT", "AGGT"]


def test_consensus_custom_counts():
    graph = Graph()
    eng = PoaAligner(3, -5, -4)
    for s in ["ACGTACGT", "ACGTACGT", "ACCTACGT"]:
        graph.add_alignment(eng.align(s, graph, NW), s)
    cons, dst = graph.generate_consensus_custom()
    assert cons == "ACGTACGT"
    assert dst[0] == 3 and dst[2] == 2  # the SNP column has 2 agreeing


def _window(draft, internals=(), pres=(), sufs=(), wtype=SHORT):
    w = Window(encode(draft), wtype)
    for a in internals:
        w.add_internal(encode(a))
    for a in pres:
        w.add_prefix(encode(a))
    for a in sufs:
        w.add_suffix(encode(a))
    return w


def test_short_window_consensus_fixes_error():
    eng = ConsensusEngine(ScoreParams())
    draft = "ACGTTTTACGATCGTACCGGTT"
    truth = "ACGTTTTACGCATCGTACCGGTT"  # draft has a deletion of C
    w = _window(draft, internals=[truth, truth, truth])
    eng.generate_consensus(w)
    assert w.consensus == truth


def test_short_window_empty_majority_deletes():
    eng = ConsensusEngine(ScoreParams())
    w = _window("ACGT", internals=["ACGT"])
    w.add_empty()
    w.add_empty()
    eng.generate_consensus(w)
    assert w.consensus == ""


def test_short_window_single_arm_keeps_draft():
    eng = ConsensusEngine(ScoreParams())
    w = _window("ACGTACGT", internals=["ACGTTCGT"])
    eng.generate_consensus(w)
    assert w.consensus == "ACGTACGT"


def test_short_window_prefix_suffix_only():
    eng = ConsensusEngine(ScoreParams())
    truth = "ACGTTGCAACGGTTACAGATTACA"
    draft = "ACGTTGCAACGGTTACAGATTACA"
    pres = [truth[:15], truth[:18], truth[:20]]
    sufs = [truth[8:], truth[5:], truth[3:]]
    w = _window(draft, pres=pres, sufs=sufs)
    eng.generate_consensus(w)
    assert w.consensus == truth


def test_long_window_consensus_two_rounds():
    eng = ConsensusEngine(ScoreParams())
    truth = "ACGTTGCAACGGTTACAGATTACAGGTTCCAAGGTT"
    draft = truth[:10] + truth[12:]  # 2bp deletion
    w = _window(draft, internals=[truth] * 5, wtype=LONG)
    eng.generate_consensus(w)
    assert w.consensus == truth

def test_consensus_custom2_subset_counts():
    # HyPo-added spoa graph.cpp:571-606: counts restricted to a subset
    graph = Graph()
    eng = PoaAligner(3, -5, -4)
    seqs = ["ACGTACGT", "ACGTACGT", "ACCTACGT"]
    for s in seqs:
        graph.add_alignment(eng.align(s, graph, NW), s)
    cons, dst = graph.generate_consensus_custom2([0, 1])
    assert cons == "ACGTACGT"
    assert dst[0] == 2 and dst[2] == 2  # only the two exact copies count
    _, dst_all = graph.generate_consensus_custom2([0, 1, 2])
    _, dst_ref = graph.generate_consensus_custom()
    assert dst_all == dst_ref


def test_msa_custom_subset_rows():
    graph = Graph()
    eng = PoaAligner(5, -4, -8)
    seqs = ["ACGT", "AGGT", "ACGT"]
    for s in seqs:
        graph.add_alignment(eng.align(s, graph, NW), s)
    rows = graph.generate_msa_custom([1, 2])
    assert rows == ["AGGT", "ACGT"]
    assert graph.generate_msa_custom([0, 1, 2]) == graph.generate_msa()
