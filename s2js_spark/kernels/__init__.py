"""Vectorized NumPy S2 core kernels.

Everything here operates on NumPy arrays (uint64 cell ids, float64
coordinates) so it can run columnar inside Arrow-batched pandas UDFs
with no per-row Python. Semantics match the reference S2 library
bit-for-bit (see per-function citations).
"""

from . import cellid, hilbert, stuv  # noqa: F401
