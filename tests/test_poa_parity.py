"""Differential tests: my POA oracle vs the reference's adapted spoa.

The reference spoa is compiled once into /tmp/spoa_oracle/spoa_harness
(from the read-only reference checkout; nothing is vendored).  Tests are
skipped when the harness is unavailable.  These pin down exact parity of
DP scores, traceback tie-breaking, graph fusion, topological order, and
heaviest-bundle consensus — the core of FASTA byte-parity.
"""
import os
import subprocess

import numpy as np
import pytest

from hypo_tpu.poa import Graph, PoaAligner, NW, LOV, ROV

HARNESS = "/tmp/spoa_oracle/spoa_harness"

pytestmark = pytest.mark.skipif(not os.path.exists(HARNESS),
                                reason="reference spoa harness not built")


def ref_consensus(entries, m, x, g, custom=False):
    inp = "".join(f"{mode}\t{seq}\n" for mode, seq in entries)
    args = [HARNESS, str(m), str(x), str(g)] + (["custom"] if custom else [])
    out = subprocess.run(args, input=inp, capture_output=True, text=True,
                         check=True).stdout.splitlines()
    if custom:
        cons = out[0] if out else ""
        dst = [int(v) for v in out[1].split()] if len(out) > 1 else []
        return cons, dst
    return out[0] if out else ""


def my_consensus(entries, m, x, g, custom=False):
    graph = Graph()
    eng = PoaAligner(m, x, g)
    modes = {"N": NW, "L": LOV, "R": ROV}
    for mode, seq in entries:
        graph.add_alignment(eng.align(seq, graph, modes[mode]), seq)
    if custom:
        return graph.generate_consensus_custom()
    return graph.generate_consensus()


def rand_seq(rng, lo, hi):
    return "".join(rng.choice(list("ACGT"),
                              size=int(rng.integers(lo, hi))))


def mutate(rng, seq, rate):
    out = []
    for c in seq:
        r = rng.random()
        if r < rate / 3:
            continue  # deletion
        if r < 2 * rate / 3:
            out.append(rng.choice(list("ACGT")))  # substitution
            out.append(c)  # insertion before (keeps length-ish)
        elif r < rate:
            out.append(rng.choice(list("ACGT")))
        else:
            out.append(c)
    return "".join(out)


def test_parity_nw_random():
    rng = np.random.default_rng(10)
    for trial in range(25):
        base = rand_seq(rng, 30, 120)
        entries = [("N", "J" + mutate(rng, base, 0.08) + "O")
                   for _ in range(int(rng.integers(2, 8)))]
        assert my_consensus(entries, 5, -4, -8) == \
            ref_consensus(entries, 5, -4, -8), trial


def test_parity_short_window_mix():
    # the short-window shape: internal kNW w/ markers, prefixes kLOV in
    # reverse length order, suffixes kROV
    rng = np.random.default_rng(11)
    for trial in range(25):
        base = rand_seq(rng, 40, 150)
        entries = []
        for _ in range(int(rng.integers(1, 5))):
            entries.append(("N", "J" + mutate(rng, base, 0.06) + "O"))
        for _ in range(int(rng.integers(0, 4))):
            cut = int(rng.integers(5, max(6, len(base) - 5)))
            entries.append(("L", "J" + mutate(rng, base[:cut], 0.06)))
        for _ in range(int(rng.integers(0, 4))):
            cut = int(rng.integers(5, max(6, len(base) - 5)))
            entries.append(("R", mutate(rng, base[cut:], 0.06) + "O"))
        assert my_consensus(entries, 5, -4, -8) == \
            ref_consensus(entries, 5, -4, -8), trial


def test_parity_long_window_custom_counts():
    rng = np.random.default_rng(12)
    for trial in range(15):
        base = rand_seq(rng, 60, 250)
        entries = [("N", mutate(rng, base, 0.15))
                   for _ in range(int(rng.integers(2, 7)))]
        mine, my_dst = my_consensus(entries, 3, -5, -4, custom=True)
        ref, ref_dst = ref_consensus(entries, 3, -5, -4, custom=True)
        assert mine == ref, trial
        assert my_dst == ref_dst, trial


def test_parity_high_error_long_reads():
    rng = np.random.default_rng(13)
    for trial in range(10):
        base = rand_seq(rng, 100, 400)
        entries = [("N", mutate(rng, base, 0.25)) for _ in range(5)]
        assert my_consensus(entries, 3, -5, -4) == \
            ref_consensus(entries, 3, -5, -4), trial
