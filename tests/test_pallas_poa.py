"""Pallas POA DP kernel vs the XLA scan kernel: exact bp/max_row parity
(interpret mode on CPU)."""
import numpy as np
import pytest

from hypo_tpu.parallel.mesh import make_example_inputs
from hypo_tpu.poa import jax_poa, pallas_poa


@pytest.mark.parametrize("N,L,P,B", [(64, 64, 4, 16), (96, 100, 8, 8)])
def test_pallas_matches_xla(N, L, P, B):
    inputs = make_example_inputs(B=B, N=N, L=L, Pcap=P, R=48)
    args = inputs[:8]
    kw = dict(N=N, L=L, P=P, m=5, n=-4, g=-8)
    bp1, mr1 = pallas_poa.poa_dp_batch_pallas(*args, interpret=True, **kw)
    bp2, mr2 = jax_poa.poa_dp_batch(*args, **kw)
    assert np.array_equal(np.asarray(mr1), np.asarray(mr2))
    assert np.array_equal(np.asarray(bp1), np.asarray(bp2))


def test_pallas_batch_padding():
    # B not a multiple of TW exercises the pad/crop path
    N, L, P, B = 64, 64, 4, 5
    inputs = make_example_inputs(B=B, N=N, L=L, Pcap=P, R=48)
    args = inputs[:8]
    kw = dict(N=N, L=L, P=P, m=5, n=-4, g=-8)
    bp1, mr1 = pallas_poa.poa_dp_batch_pallas(*args, interpret=True, **kw)
    bp2, mr2 = jax_poa.poa_dp_batch(*args, **kw)
    assert np.array_equal(np.asarray(mr1), np.asarray(mr2))
    assert np.array_equal(np.asarray(bp1), np.asarray(bp2))
