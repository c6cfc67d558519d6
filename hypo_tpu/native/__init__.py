from .api import (available, NativeGraph,  # noqa: F401
                  native_window_consensus)
