"""Solid-position discovery on a draft contig.

Vectorized equivalent of reference Contig::find_solid_pos
(src/Contig.cpp:40-74): mark each position where a solid k-mer starts,
excluding k-mers whose terminals extend a homopolymer (the last base
equals the next base, or the first base equals the previous base).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..dna import kmer_codes
from ..kmers.solid import SolidKmers


def find_solid_pos(codes: np.ndarray, sk: SolidKmers
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (positions int64[], kids int64[]) sorted by position."""
    k = sk.k
    n = len(codes)
    km, valid = kmer_codes(codes, k)
    if len(km) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    solid = valid & sk.is_solid(np.where(valid, km, 0))
    # k-mer with start s covers [s, s+k); end base index e = s+k-1
    starts = np.arange(n - k + 1)
    ends = starts + k - 1
    # exclude if base after kmer equals last base of kmer
    nxt_same = np.zeros(n - k + 1, dtype=bool)
    nxt_same[:-1] = codes[ends[:-1] + 1] == codes[ends[:-1]]
    # exclude if base before kmer equals first base of kmer
    prv_same = np.zeros(n - k + 1, dtype=bool)
    prv_same[1:] = codes[starts[1:] - 1] == codes[starts[1:]]
    keep = solid & ~nxt_same & ~prv_same
    pos = starts[keep].astype(np.int64)
    return pos, km[keep].astype(np.int64)
