"""Native (C++) host runtime components, loaded via ctypes.

The reference's host runtime is entirely C++; here the TPU owns all
compute, and the native layer covers the genuinely host-bound pieces:
bulk data-file parsing and trajectory formatting.  Everything degrades
gracefully to numpy when the shared library is missing.
"""

from .build import load_fastio  # noqa: F401
