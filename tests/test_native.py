"""Native (C++) POA engine must match the Python oracle exactly."""
import numpy as np
import pytest

from hypo_tpu.config import ScoreParams
from hypo_tpu.dna import encode
from hypo_tpu import native
from hypo_tpu.poa import Graph, PoaAligner, NW, LOV, ROV
from hypo_tpu.poa.engine import ConsensusEngine
from hypo_tpu.pipeline.window import Window, SHORT, LONG

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++)")


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


@pytest.mark.parametrize("scores", [(5, -4, -8), (3, -5, -4)])
def test_native_graph_matches_python(scores):
    rng = np.random.default_rng(30)
    for trial in range(10):
        base = rand_seq(rng, 30, 120)
        py = Graph()
        nat = native.NativeGraph()
        aligner = PoaAligner(*scores)
        seqs = [("J" + mutate(rng, base, 0.1) + "O", NW)
                for _ in range(3)]
        cut = int(rng.integers(5, len(base)))
        seqs.append(("J" + mutate(rng, base[:cut], 0.1), LOV))
        seqs.append((mutate(rng, base[cut:], 0.1) + "O", ROV))
        for seq, mode in seqs:
            want = aligner.align(seq, py, mode)
            got = nat.align(seq, mode, *scores)
            assert got == want, trial
            py.add_alignment(want, seq)
            nat.add_alignment(got, seq)
            assert nat.num_nodes() == len(py.nodes)
        assert nat.consensus() == py.generate_consensus()
        pc, pd = py.generate_consensus_custom()
        nc, nd = nat.consensus_custom()
        assert (nc, nd) == (pc, pd)


def test_native_extract_matches_python():
    from hypo_tpu.poa import jax_poa
    rng = np.random.default_rng(31)
    base = rand_seq(rng, 40, 80)
    py = Graph()
    nat = native.NativeGraph()
    aligner = PoaAligner(5, -4, -8)
    for _ in range(4):
        s = mutate(rng, base, 0.15)
        a = aligner.align(s, py, NW)
        py.add_alignment(a, s)
        nat.add_alignment(a, s)
    want = jax_poa.extract_graph_arrays(py, 256, 8)
    got = nat.extract(256, 8)
    assert got is not None and want is not None
    wn, wp, wc, we, wnn = want
    gn, gp, gc, ge, gnn, grank = got
    assert gnn == wnn
    assert np.array_equal(gn[:gnn], wn[:wnn])
    assert np.array_equal(gp[:gnn], wp[:wnn])
    assert np.array_equal(gc[:gnn], wc[:wnn])
    assert np.array_equal(ge[:gnn], we[:wnn])
    assert grank[:gnn].tolist() == py.rank_to_node_id


def _window(rng, wtype):
    base = rand_seq(rng, 40, 140)
    w = Window(encode(base), wtype)
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
    return w


def test_native_window_consensus_matches_oracle():
    sp = ScoreParams()
    py_eng = ConsensusEngine(sp, use_native=False)
    nat_eng = ConsensusEngine(sp, use_native=True)
    assert nat_eng.use_native
    rng = np.random.default_rng(32)
    wins_py = [_window(rng, SHORT if i % 3 else LONG) for i in range(30)]
    rng = np.random.default_rng(32)
    wins_nat = [_window(rng, SHORT if i % 3 else LONG) for i in range(30)]
    for i, (wp, wn) in enumerate(zip(wins_py, wins_nat)):
        py_eng.generate_consensus(wp)
        nat_eng.generate_consensus(wn)
        assert wn.consensus == wp.consensus, i
