"""Pallas TPU kernels for the hot fused paths.

These complement the XLA-compiled ops: where XLA's fusion stops (e.g. the
frame -> DFT-matmul -> power -> mel chain round-trips intermediates through
HBM), a Pallas kernel keeps the whole per-tile pipeline in VMEM. Kernels are
optional accelerators — every one has a pure-jnp reference implementation in
:mod:`audioflow_tpu.ops` that tests compare against (interpret mode on CPU,
compiled on TPU).
"""

from .melspec import mel_spectrogram_pallas, melspec_available

__all__ = ["mel_spectrogram_pallas", "melspec_available"]
