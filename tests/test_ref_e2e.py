"""Whole-pipeline differential test against the REFERENCE binary
(SURVEY §4c).

Build the binary once with ``tools/build_reference.sh`` (result:
/tmp/ref_build/build/bin/hypo); tests skip when it is absent.  The
reference's only external runtime dependency — the KMC3 subprocess for
solid-kmer counting — is bypassed through its own stage-resume
mechanism (-i): we export OUR solid-kmer bitmask in the reference's
sdsl aux format and mark stage SK done, which both pins the two
pipelines to identical solid kmers and exercises the format interop.

Known deliberate divergences are documented in PARITY.md.
"""
import os
import subprocess

import pytest

from hypo_tpu.config import InputFlags, get_kmer_len
from hypo_tpu.io.fasta import read_fastx
from hypo_tpu.kmers.solid import SolidKmers
from hypo_tpu.pipeline.polish import polish
from hypo_tpu.sim import SimConfig, simulate

REF_BIN = "/tmp/ref_build/build/bin/hypo"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_BIN),
    reason="reference binary not built (run tools/build_reference.sh)")


def _run_reference(workdir, sim, size, k, cov, extra=()):
    """Run the reference with our solid kmers pre-staged into aux/."""
    cmd = [REF_BIN, "-r", sim["reads"], "-d", sim["draft"],
           "-b", sim["sr_bam"], "-c", str(cov), "-s", size,
           "-t", "2", "-o", "ref_out.fa", "-i", *extra]
    r = subprocess.run(cmd, cwd=workdir, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    return os.path.join(workdir, "ref_out.fa")


@pytest.mark.parametrize("seed,gsize,size,hybrid", [
    (5, 200_000, "200k", False),
    (21, 300_000, "300k", True),
])
def test_e2e_fasta_parity(tmp_path, seed, gsize, size, hybrid):
    cfg = SimConfig(genome_size=gsize, seed=seed)
    if hybrid:
        cfg.long_cov = 25
        cfg.dropout = (0.3, 0.42)
    sim = simulate(cfg, str(tmp_path))
    k = get_kmer_len(size)
    cov = sim["short_cov"]

    # ours (host engine; device tie-breaking is covered elsewhere)
    flags = InputFlags(
        sr_filenames=[sim["reads"]], sr_bam_filename=sim["sr_bam"],
        lr_bam_filename=sim["lr_bam"] or "",
        draft_filename=sim["draft"],
        output_filename=str(tmp_path / "ours.fa"),
        k=k, cov=cov, threads=2, use_device_poa=False,
        aux_dir=str(tmp_path / "aux"))
    polish(flags)

    # export our solid kmers in the reference's aux format + stage mark
    aux = tmp_path / "aux"
    aux.mkdir(exist_ok=True)
    sk = SolidKmers(k).initialise([sim["reads"]], cov)
    sk.store_sdsl(str(aux / "solid_kmers.bvsd"))
    with open(aux / "stage.txt", "w") as fh:
        fh.write("Stage:SolidKmers [0.0 sec]\t1\n")

    extra = ("-B", sim["lr_bam"]) if hybrid else ()
    ref_fa = _run_reference(str(tmp_path), sim, size, k, cov, extra)

    ours = dict(read_fastx(flags.output_filename))
    refs = dict(read_fastx(ref_fa))
    assert set(ours) == set(refs)
    # measured byte-identical on 200k/300k/500k sims (seeds 5, 11, 12)
    for name in ours:
        assert ours[name] == refs[name], f"contig {name} differs"
