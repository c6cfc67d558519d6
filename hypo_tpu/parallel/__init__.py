from .mesh import make_mesh, sharded_polish_step, device_kmer_histogram  # noqa: F401
