"""Native (C++) host-side kernels, bound via ctypes.

Built lazily with the system ``g++`` on first use and cached next to the
sources; every consumer has a pure-numpy fallback, so a missing toolchain
degrades performance, never correctness.
"""

from podtpu.native.build import get_lib, native_class_tp_fp  # noqa: F401
