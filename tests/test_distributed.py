"""Multi-host distribution glue (hypo_tpu/parallel/distributed.py).

The reference has no distributed layer (SURVEY §2.3); these validate the
TPU-native one: deterministic contig sharding, psum histogram merge on
the virtual 8-device mesh, and the rank-0 FASTA gather."""
import os

import numpy as np

from hypo_tpu.parallel import distributed as dist
from hypo_tpu.io.fasta import write_fasta, read_fastx


def test_shard_contigs_balanced_and_deterministic():
    lengths = [100, 5000, 40, 40, 3000, 900, 10]
    shards = dist.shard_contigs(lengths, 3)
    assert sorted(sum(shards, [])) == list(range(len(lengths)))
    loads = [sum(lengths[c] for c in s) for s in shards]
    assert max(loads) <= 5000  # longest-first keeps the giant alone
    assert shards == dist.shard_contigs(lengths, 3)
    for s in shards:
        assert s == sorted(s)  # draft order within shard


def test_shard_contigs_more_shards_than_contigs():
    shards = dist.shard_contigs([10, 20], 4)
    assert sorted(sum(shards, [])) == [0, 1]
    assert sum(1 for s in shards if s) == 2


def test_shard_files_round_robin():
    paths = [f"r{i}.fq" for i in range(5)]
    got = [dist.shard_files(paths, p, 2) for p in range(2)]
    assert got[0] == ["r0.fq", "r2.fq", "r4.fq"]
    assert got[1] == ["r1.fq", "r3.fq"]
    assert sorted(got[0] + got[1]) == sorted(paths)


def test_merge_histograms_psum_identity_single_process():
    h = np.arange(17, dtype=np.int32)
    merged = dist.merge_histograms_psum(h)
    np.testing.assert_array_equal(merged, h)


def test_gather_polished_fasta(tmp_path):
    out = str(tmp_path / "polished.fa")
    draft_order = ["c0", "c1", "c2", "c3"]
    seqs = {n: "ACGT" * (i + 1) for i, n in enumerate(draft_order)}
    shards = [["c1", "c3"], ["c0", "c2"]]  # interleaved across 2 hosts
    for pid, names in enumerate(shards):
        sp = f"{out}.shard{pid}"
        write_fasta(sp, ((n, seqs[n]) for n in names))
        open(sp + ".done", "w").close()
    dist.gather_polished_fasta(out, 2, 1, draft_order)  # non-root no-op
    assert not os.path.exists(out)
    dist.gather_polished_fasta(out, 2, 0, draft_order)
    got = list(read_fastx(out))
    assert [n for n, _ in got] == draft_order
    assert all(s == seqs[n] for n, s in got)


def test_gather_missing_contig_raises(tmp_path):
    out = str(tmp_path / "p.fa")
    write_fasta(out + ".shard0", [("c0", "ACGT")])
    open(out + ".shard0.done", "w").close()
    import pytest
    with pytest.raises(RuntimeError):
        dist.gather_polished_fasta(out, 1, 0, ["c0", "cMISSING"])
