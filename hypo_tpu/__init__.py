"""hypo_tpu — a TPU-native hybrid genome-assembly polisher.

A from-scratch reimplementation of the capabilities of kensung-lab/hypo
(reference: /root/reference) designed TPU-first:

- sequence data lives in flat uint8/uint32 numpy arrays on the host and
  fixed-shape batched tensors on the device;
- solid k-mer discovery (the reference's SUK + KMC subprocess,
  reference external/suk/src/SolidKmers.cpp) is a vectorized k-mer
  hashing + histogram pipeline (``hypo_tpu.kmers``);
- strong/weak-region segmentation (reference src/Contig.cpp) is a set of
  vectorized segment scans over position arrays (``hypo_tpu.segment``);
- window consensus (reference src/Window.cpp + adapted spoa) is a
  partial-order-alignment engine with an exact NumPy oracle
  (``hypo_tpu.poa``) and a batched JAX/Pallas DP kernel for the device
  hot loop;
- the pipeline (reference src/Hypo.cpp) orchestrates batches of contigs
  and shards windows across a ``jax.sharding.Mesh`` (``hypo_tpu.parallel``).
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
