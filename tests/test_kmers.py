import collections

import numpy as np
import pytest

from hypo_tpu import dna
from hypo_tpu.kmers import (Bitset, CutOffs, KmerCounter, SolidKmers,
                            count_files, find_cutoffs)


def naive_canonical_counts(seqs, k):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    counts = collections.Counter()
    for s in seqs:
        for i in range(len(s) - k + 1):
            sub = s[i:i + k]
            if any(c not in "ACGT" for c in sub):
                continue
            rc = "".join(comp[c] for c in reversed(sub))
            counts[min(sub, rc)] += 1
    return counts


def kmer_to_int(s):
    v = 0
    for c in s:
        v = v * 4 + "ACGT".index(c)
    return v


@pytest.mark.parametrize("dense", [True, False])
def test_counter_matches_naive(dense, monkeypatch):
    if not dense:
        monkeypatch.setattr("hypo_tpu.kmers.counting.DENSE_LIMIT", 1)
    rng = np.random.default_rng(2)
    seqs = ["".join(rng.choice(list("ACGTN"), p=[.24, .26, .25, .24, .01],
                               size=int(rng.integers(20, 120))))
            for _ in range(60)]
    k = 7
    counter = KmerCounter(k)
    counter.add_reads(seqs)
    codes, counts = counter.items()
    naive = naive_canonical_counts(seqs, k)
    got = {int(c): int(n) for c, n in zip(codes, counts)}
    want = {kmer_to_int(s): n for s, n in naive.items()}
    assert got == want


def test_sparse_compaction(monkeypatch):
    monkeypatch.setattr("hypo_tpu.kmers.counting.DENSE_LIMIT", 1)
    counter = KmerCounter(5)
    counter._pending_n = 0
    for _ in range(3):
        counter.add_codes(dna.encode("ACGTACGTACGT"))
        counter._compact()
    codes, counts = counter.items()
    naive = naive_canonical_counts(["ACGTACGTACGT"] * 3, 5)
    assert {int(c): int(n) for c, n in zip(codes, counts)} == {
        kmer_to_int(s): n for s, n in naive.items()}


def test_native_sparse_counter_parity_k15(monkeypatch):
    """The native radix-partitioned sparse counter (the KMC3-scale
    k >= 15 path, host_native.cpp hypo_sparse_counter_*) must agree
    exactly with the NumPy sparse oracle on a multi-batch workload."""
    from hypo_tpu.native import host_api
    if not host_api.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    k = 15
    batches = []
    for _ in range(3):
        codes = rng.integers(0, 4, size=50_000).astype(np.uint8)
        codes[rng.integers(0, len(codes), 50)] = 4  # N separators
        batches.append(codes)

    native = host_api.SparseCounterNative(k, pbits=4, pending_limit=10_000)
    for b in batches:
        native.add(b)
    got_codes, got_counts = native.items()
    native.close()

    monkeypatch.setenv("HYPO_TPU_NO_NATIVE", "1")
    monkeypatch.setattr("hypo_tpu.kmers.counting.DENSE_LIMIT", 1)
    oracle = KmerCounter(k, cap=0xFFFFFFFF)
    for b in batches:
        oracle.add_codes(b)
    want_codes, want_counts = oracle.items()
    np.testing.assert_array_equal(got_codes, want_codes)
    np.testing.assert_array_equal(got_counts, want_counts)
    # ascending (partition-ordered) output like the oracle
    assert np.all(np.diff(got_codes) > 0)


def test_bitset():
    bs = Bitset(1000)
    idx = np.array([0, 63, 64, 999, 63])
    bs.set_many(idx)
    assert bs.test(np.array([0, 1, 63, 64, 998, 999])).tolist() == [
        True, False, True, True, False, True]
    assert bs.count() == 4


def test_find_cutoffs_bimodal():
    # error peak at low counts, real coverage peak at 30
    x = np.arange(121)
    hist = (2000 * np.exp(-x / 1.5) + 500 * np.exp(-((x - 30) ** 2) / 40)
            ).astype(np.int64)
    c = find_cutoffs(hist)
    assert c.mean == 30
    assert c.err < c.lower < c.mean < c.upper


def test_solid_kmers_selection_and_rc():
    k = 5
    sk = SolidKmers(k)
    aacgt = kmer_to_int("AACGT")   # HP at start (AA) -> excluded
    acgta = kmer_to_int("ACGTA")   # fine
    acgtt = kmer_to_int("ACGTT")   # HP at end -> excluded
    codes = np.array([aacgt, acgta, acgtt, kmer_to_int("AGAGA")])
    counts = np.array([10, 10, 10, 1])
    sk.fill(codes, counts, lower=5, upper=20)
    assert sk.num_solid == 1
    assert sk.is_solid(np.array([acgta]))[0]
    rc = int(dna.revcomp_kmers(np.array([acgta]), k)[0])
    assert sk.is_solid(np.array([rc]))[0]
    assert not sk.is_solid(np.array([aacgt]))[0]
    assert not sk.is_solid(np.array([kmer_to_int("AGAGA")]))[0]


def test_solid_kmers_initialise_and_store(tmp_path):
    rng = np.random.default_rng(3)
    genome = "".join(rng.choice(list("ACGT"), size=2000))
    reads = []
    for _ in range(400):
        start = int(rng.integers(0, len(genome) - 60))
        reads.append(genome[start:start + 60])
    fq = tmp_path / "reads.fa"
    fq.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)))
    sk = SolidKmers(7).initialise([str(fq)], coverage=12)
    assert sk.num_solid > 100
    # genome kmers should largely be solid (~44% of random 7-mers are
    # excluded by the terminal-homopolymer rule, so ~0.45 is the ceiling)
    km, valid = dna.kmer_codes(dna.encode(genome), 7)
    frac = sk.is_solid(km[valid]).mean()
    assert frac > 0.4
    p = tmp_path / "sk.npz"
    sk.store(str(p))
    sk2 = SolidKmers.load(str(p))
    assert sk2.k == 7 and sk2.num_solid == sk.num_solid
    assert np.array_equal(sk2.bitset.words, sk.bitset.words)
