"""Device POA (jax_poa + batch runner) must match the host oracle
exactly — same alignments, same graphs, same consensus."""
import numpy as np
import pytest

from hypo_tpu.config import ScoreParams
from hypo_tpu.dna import encode
from hypo_tpu.poa import Graph, PoaAligner, NW, LOV, ROV
from hypo_tpu.poa.batch import DeviceConsensusRunner
from hypo_tpu.poa.engine import ConsensusEngine
from hypo_tpu.poa import jax_poa
from hypo_tpu.pipeline.window import Window, SHORT, LONG


def rand_seq(rng, lo, hi):
    return "".join(rng.choice(list("ACGT"), size=int(rng.integers(lo, hi))))


def mutate(rng, seq, rate):
    out = []
    for c in seq:
        r = rng.random()
        if r < rate / 3:
            continue
        if r < 2 * rate / 3:
            out.append(rng.choice(list("ACGT")))
        out.append(c)
    return "".join(out)


def device_align_one(graph, seq, mode, scores, N=192, L=192, P=8):
    ext = jax_poa.extract_graph_arrays(graph, N, P)
    assert ext is not None
    nc, pr, pc, ie, nn = ext
    arm = np.zeros(L, dtype=np.int32)
    codes = jax_poa.encode_global(seq)
    arm[:len(codes)] = codes
    m, n, g = scores
    bp, max_row = jax_poa.poa_dp_batch(
        nc[None], pr[None], pc[None], ie[None],
        np.array([nn], np.int32), arm[None],
        np.array([len(codes)], np.int32), np.array([mode], np.int32),
        N=N, L=L, P=P, m=m, n=n, g=g)
    return jax_poa.traceback_from_bp(
        np.asarray(bp)[0], pr, graph.rank_to_node_id, len(codes), mode,
        int(np.asarray(max_row)[0]), P)


@pytest.mark.parametrize("scores", [(5, -4, -8), (3, -5, -4)])
def test_device_alignment_matches_oracle(scores):
    rng = np.random.default_rng(20)
    aligner = PoaAligner(*scores)
    for trial in range(6):
        base = rand_seq(rng, 30, 100)
        graph = Graph()
        seqs = [("J" + mutate(rng, base, 0.1) + "O", NW)
                for _ in range(3)]
        cut = int(rng.integers(5, len(base)))
        seqs.append(("J" + mutate(rng, base[:cut], 0.1), LOV))
        seqs.append((mutate(rng, base[cut:], 0.1) + "O", ROV))
        for si, (seq, mode) in enumerate(seqs):
            want = aligner.align(seq, graph, mode)
            if si > 0:  # device path needs a non-empty graph
                got = device_align_one(graph, seq, mode, scores)
                assert got == want, (trial, si, mode)
            graph.add_alignment(want, seq)


def _make_windows(rng, n_windows):
    wins = []
    for _ in range(n_windows):
        base = rand_seq(rng, 40, 140)
        wt = SHORT if rng.random() < 0.7 else LONG
        w = Window(encode(base), wt)
        for _ in range(int(rng.integers(0, 6))):
            w.add_internal(encode(mutate(rng, base, 0.08)))
        for _ in range(int(rng.integers(0, 3))):
            cut = int(rng.integers(5, len(base)))
            w.add_prefix(encode(mutate(rng, base[:cut], 0.08)))
        for _ in range(int(rng.integers(0, 3))):
            cut = int(rng.integers(5, len(base)))
            w.add_suffix(encode(mutate(rng, base[cut:], 0.08)))
        for _ in range(int(rng.integers(0, 2))):
            w.add_empty()
        wins.append(w)
    return wins


def test_runner_matches_host_engine():
    rng = np.random.default_rng(21)
    sp = ScoreParams()
    wins_host = _make_windows(rng, 24)
    rng = np.random.default_rng(21)
    wins_dev = _make_windows(rng, 24)
    host = ConsensusEngine(sp)
    for w in wins_host:
        host.generate_consensus(w)
    runner = DeviceConsensusRunner(sp)
    runner.run_windows(wins_dev)
    assert runner.stats["device_aligns"] > 0
    for i, (wh, wd) in enumerate(zip(wins_host, wins_dev)):
        assert wd.consensus == wh.consensus, i
