"""Tests for the fully on-device POA kernel (hypo_tpu.poa.device_full)
against its executable NumPy spec (hypo_tpu.poa.colpoa_ref), and for the
spec against the spoa-semantics oracle."""
import numpy as np
import pytest

from hypo_tpu.poa.colpoa_ref import ColPoa
from hypo_tpu.poa import device_full as DF
from hypo_tpu.poa.jax_poa import GLOBAL_ALPHABET, GLOBAL_CODE

NW, LOV, ROV = 0, 1, 2


def _mutate(rng, codes, rate):
    out = []
    for c in codes:
        r = rng.random()
        if r < rate / 3:
            continue
        elif r < 2 * rate / 3:
            out.append(int(rng.integers(4)))
            out.append(c)
        elif r < rate:
            out.append(int(rng.integers(4)))
        else:
            out.append(c)
    return out


def _random_jobs(rng, B, K, L, tlen, err, with_modes=True):
    arms = np.zeros((B, K, L), np.int32)
    alen = np.zeros((B, K), np.int32)
    amode = np.zeros((B, K), np.int32)
    narms = np.zeros(B, np.int32)
    specs = []
    for b in range(B):
        truth = [int(x) for x in rng.integers(0, 4, size=tlen)]
        seqs = []
        for _ in range(int(rng.integers(3, K))):
            md = (int(rng.choice([NW, NW, NW, LOV, ROV]))
                  if with_modes else NW)
            s = _mutate(rng, truth, err)
            if md == NW:
                s = [4] + s + [5]
            elif md == LOV:
                s = [4] + s[:max(1, len(s) // 2)]
            else:
                s = s[len(s) // 2:] + [5]
            seqs.append((s[:L], md))
        narms[b] = len(seqs)
        for k, (s, md) in enumerate(seqs):
            arms[b, k, :len(s)] = s
            alen[b, k] = len(s)
            amode[b, k] = md
        specs.append(seqs)
    return arms, alen, amode, narms, specs


@pytest.mark.parametrize("caps", [(128, 64, 12, 8), (96, 48, 10, 4)])
def test_kernel_matches_colpoa_spec(caps):
    N, L, K, P = caps
    rng = np.random.default_rng(N + P)
    B = 8
    arms, alen, amode, narms, specs = _random_jobs(
        rng, B, K, L, tlen=36, err=0.12)
    cc, cs, cl, ovf = DF.poa_full_batch(
        arms, alen, amode, narms, N=N, L=L, K=K, P=P, m=5, n=-4, g=-8)
    cc, cs, cl, ovf = map(np.asarray, (cc, cs, cl, ovf))
    n_checked = 0
    for b in range(B):
        if ovf[b]:
            continue
        cp = ColPoa(5, -4, -8)
        for s, md in specs[b]:
            cp.add(s, md)
        codes, sup = cp.consensus()
        assert cc[b, :cl[b]].tolist() == codes
        assert cs[b, :cl[b]].tolist() == sup
        n_checked += 1
    assert n_checked >= B // 2


def test_kernel_flags_overflow_and_matches_elsewhere():
    N, L, K, P = 64, 48, 12, 2
    rng = np.random.default_rng(99)
    B = 16
    arms, alen, amode, narms, specs = _random_jobs(
        rng, B, K, L, tlen=30, err=0.25)
    cc, cs, cl, ovf = DF.poa_full_batch(
        arms, alen, amode, narms, N=N, L=L, K=K, P=P, m=5, n=-4, g=-8)
    cc, cs, cl, ovf = map(np.asarray, (cc, cs, cl, ovf))
    for b in range(B):
        cp = ColPoa(5, -4, -8)
        ref_ovf = False
        for s, md in specs[b]:
            cp.add(s, md)
            if (len(cp.node_code) > N
                    or max((len(p) for p in cp.pred_nd), default=0) > P):
                ref_ovf = True
                break
        if ref_ovf:
            assert ovf[b], "device must flag what the spec overflows"
        elif not ovf[b]:
            codes, sup = cp.consensus()
            assert cc[b, :cl[b]].tolist() == codes
            assert cs[b, :cl[b]].tolist() == sup


def test_full_kernel_pallas_dp_matches_xla_dp():
    """The production TPU path (Pallas DP inside the full kernel) must be
    bit-identical to the XLA-scan DP path."""
    N, L, K, P = 96, 64, 10, 8
    rng = np.random.default_rng(123)
    B = 6
    arms, alen, amode, narms, _specs = _random_jobs(
        rng, B, K, L, tlen=30, err=0.12)
    out_x = DF.poa_full_batch(arms, alen, amode, narms, N=N, L=L, K=K,
                              P=P, m=5, n=-4, g=-8, dp_impl="xla")
    out_p = DF.poa_full_batch(arms, alen, amode, narms, N=N, L=L, K=K,
                              P=P, m=5, n=-4, g=-8,
                              dp_impl="pallas_interpret")
    for a, b in zip(out_x, out_p):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_colpoa_spec_matches_spoa_oracle_consensus():
    """The deliberate tie-order differences (colpoa_ref docstring) do not
    change the consensus on randomized realistic windows."""
    from hypo_tpu.poa.graph import Graph
    from hypo_tpu.poa.align import PoaAligner
    rng = np.random.default_rng(5)
    n_ident = 0
    trials = 15
    for _ in range(trials):
        truth = [int(x) for x in rng.integers(0, 4, size=50)]
        seqs = []
        for _ in range(int(rng.integers(4, 10))):
            s = [4] + _mutate(rng, truth, 0.1) + [5]
            seqs.append("".join(GLOBAL_ALPHABET[c] for c in s))
        g = Graph()
        al = PoaAligner(5, -4, -8)
        for s in seqs:
            g.add_alignment(al.align(s, g, 0), s)
        cons_o = g.generate_consensus()
        cp = ColPoa(5, -4, -8)
        for s in seqs:
            cp.add([GLOBAL_CODE[c] for c in s], NW)
        codes, _sup = cp.consensus()
        cons_c = "".join(GLOBAL_ALPHABET[c] for c in codes)
        if cons_o == cons_c:
            n_ident += 1
    assert n_ident >= trials - 1


def test_full_runner_end_to_end_quality(tmp_path):
    """Pipeline with device_poa_mode='full' must polish as well as the
    host engine."""
    from hypo_tpu.config import InputFlags, get_kmer_len
    from hypo_tpu.pipeline.polish import polish
    from hypo_tpu.sim import SimConfig, simulate
    from hypo_tpu.eval_qv import compare
    paths = simulate(SimConfig(genome_size=8000, seed=7,
                               draft_error_rate=0.012), str(tmp_path))
    flags = InputFlags(
        sr_filenames=[paths["reads"]],
        sr_bam_filename=paths["sr_bam"],
        draft_filename=paths["draft"],
        output_filename=str(tmp_path / "polished.fa"),
        k=max(2, get_kmer_len(str(paths["genome_size"]))),
        cov=paths["short_cov"],
        use_device_poa=True,
        device_poa_mode="full",
    )
    polish(flags)
    before = compare(paths["truth"], paths["draft"])
    after = compare(paths["truth"], flags.output_filename)
    assert after["edit_distance"] < 0.25 * before["edit_distance"]


def test_weighted_add_equals_sequential_duplicates():
    """spec.add(arm, mode, w=k) must be bit-identical to k sequential
    adds of the same arm (the dedup optimization's contract)."""
    rng = np.random.default_rng(11)
    for _ in range(10):
        truth = [int(x) for x in rng.integers(0, 4, size=40)]
        variants = []
        for _ in range(4):
            s = [4] + _mutate(rng, truth, 0.08) + [5]
            variants.append(s)
        plan = [(variants[int(rng.integers(4))],
                 int(rng.integers(1, 4))) for _ in range(5)]
        a = ColPoa(5, -4, -8)
        b = ColPoa(5, -4, -8)
        for s, w in plan:
            a.add(s, NW, w=w)
            for _ in range(w):
                b.add(s, NW)
        assert a.consensus() == b.consensus()
        assert a.node_sup == b.node_sup
        assert a.pred_w == b.pred_w


def test_runner_dedup_matches_weighted_spec():
    """FullDeviceRunner's packed+deduped device path must match the
    weighted spec on the same dedup plan."""
    from hypo_tpu.poa.full_runner import _dedup
    rng = np.random.default_rng(13)
    truth = [int(x) for x in rng.integers(0, 4, size=30)]
    seqs = []
    for _ in range(12):
        s = [4] + _mutate(rng, truth, 0.05) + [5]
        seqs.append(("".join(GLOBAL_ALPHABET[c] for c in s), NW))
    dd = _dedup(seqs)
    assert sum(w for _s, _m, w in dd) == len(seqs)
    assert len(dd) < len(seqs)  # err 0.05 on len 30 -> duplicates exist
    # weighted spec == sequential spec
    a = ColPoa(5, -4, -8)
    for s, md, w in dd:
        a.add([GLOBAL_CODE[c] for c in s], md, w=w)
    b = ColPoa(5, -4, -8)
    for s, md, w in dd:   # device order = dedup order
        for _ in range(w):
            b.add([GLOBAL_CODE[c] for c in s], md)
    assert a.consensus() == b.consensus()
