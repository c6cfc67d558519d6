from .graph import Graph  # noqa: F401
from .align import PoaAligner, NW, LOV, ROV, SW, OV  # noqa: F401
