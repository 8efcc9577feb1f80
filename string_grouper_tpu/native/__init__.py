"""Native (C++/OpenMP) host kernels, built on first use and loaded via
ctypes.  Falls back cleanly to numpy implementations when no compiler is
available (see ops/rescore.py)."""

from .build import get_scorer_lib, set_native_threads

__all__ = ["get_scorer_lib", "set_native_threads"]
