import numpy as np
import pytest

from hypo_tpu import dna


def naive_kmers(seq, k):
    out = []
    val = []
    for i in range(len(seq) - k + 1):
        sub = seq[i:i + k]
        if any(c not in "ACGT" for c in sub):
            out.append(0)
            val.append(False)
        else:
            code = 0
            for c in sub:
                code = code * 4 + "ACGT".index(c)
            out.append(code)
            val.append(True)
    return np.array(out), np.array(val)


def test_encode_decode_roundtrip():
    s = "ACGTNacgtnXYZ"
    codes = dna.encode(s)
    assert dna.decode(codes) == "ACGTNACGTNNNN"


def test_revcomp():
    assert dna.decode(dna.revcomp(dna.encode("ACGTN"))) == "NACGT"


def test_kmer_codes_matches_naive():
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGTN"), p=[.24, .24, .24, .24, .04],
                             size=500))
    for k in (3, 10, 13):
        km, valid = dna.kmer_codes(dna.encode(seq), k)
        nkm, nval = naive_kmers(seq, k)
        assert np.array_equal(valid, nval)
        assert np.array_equal(km[valid], nkm[nval])


def test_canonical_kmers():
    k = 5
    km, _ = dna.kmer_codes(dna.encode("ACGTT"), k)
    rc, _ = dna.kmer_codes(dna.revcomp(dna.encode("ACGTT")), k)
    assert dna.canonical_kmers(km, k)[0] == min(km[0], rc[0])


def test_check_and_find_kmer():
    codes = dna.encode("AACGTACGTAA")
    km, _ = dna.kmer_codes(dna.encode("ACGT"), 4)
    target = int(km[0])
    assert dna.check_kmer(codes, target, 4, 1)
    assert not dna.check_kmer(codes, target, 4, 2)
    assert dna.find_kmer(codes, target, 4, 0, len(codes), True) == 1
    assert dna.find_kmer(codes, target, 4, 0, len(codes), False) == 5
    assert dna.find_kmer(codes, target, 4, 6, len(codes), True) is None


@pytest.mark.parametrize("canonical", [False, True])
def test_minimizer_scan_matches_oracle(canonical):
    rng = np.random.default_rng(1)
    for trial in range(20):
        n = int(rng.integers(5, 400))
        seq = rng.integers(0, 4, size=n).astype(np.uint8)
        v1, p1 = dna.minimizer_scan(seq, 10, 10, canonical)
        v2, p2 = dna.minimizer_scan_ref(seq, 10, 10, canonical)
        assert np.array_equal(p1, p2), trial
        assert np.array_equal(v1, v2), trial


def test_minimizer_scan_with_N_falls_back():
    seq = dna.encode("ACGTACGTACNGTACGTACGTACGTACGTACGT")
    v1, p1 = dna.minimizer_scan(seq, 5, 4)
    v2, p2 = dna.minimizer_scan_ref(seq, 5, 4)
    assert np.array_equal(p1, p2) and np.array_equal(v1, v2)


def test_rank_select():
    pos = np.array([0, 5, 9, 20])
    assert dna.rank(pos, 0) == 0
    assert dna.rank(pos, 1) == 1
    assert dna.rank(pos, 9) == 2
    assert dna.rank(pos, 10) == 3
    assert dna.select(pos, 1) == 0
    assert dna.select(pos, 4) == 20
