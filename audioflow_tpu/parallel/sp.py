"""Sequence parallelism: one long signal sharded over the TIME axis.

Batch sharding (the default, `parallel/__init__.py`) scales by files; this
module scales a SINGLE long signal across chips — the "sequence parallel"
axis. The only cross-chip dependency in a framed frontend is the frame
overlap at shard boundaries, so each shard fetches a halo of
``n_fft - hop`` samples from its right neighbor with ONE
``jax.lax.ppermute`` over ICI and then frames/transforms purely locally —
no all-gather, no resharding of the big tensor, and the spectral output
stays sharded over its frame axis for downstream frame-local stages
(mel/log/features). The halo is the SPMD analog of the streaming carry
(SURVEY §5.7): same math, chips instead of scan steps.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["sequence_sharded_spectrogram"]


def sequence_sharded_spectrogram(
    x: jnp.ndarray,
    mesh: Mesh,
    n_fft: int = 1024,
    hop: int = 256,
    window: str = "hann",
    power: bool = True,
    precision: str | None = None,
    axis: str = "data",
):
    """Spectrogram of ``x [batch, T]`` with T sharded over ``mesh[axis]``.

    Requires ``T % (n_devices * hop) == 0`` and a local shard of at least
    ``n_fft`` samples. Returns ``[batch, T // hop, bins]`` sharded over the
    frame axis; frames 0 .. (T - n_fft) // hop agree with the unsharded
    ``ops.spectrogram(x, center=False)`` to f32 reassociation (~1e-6
    relative — identical framing and banks, different dot batching); the
    trailing frames window into a zero tail (the last shard has no right
    neighbor), the streaming zero-pad convention.

    Collective footprint: exactly one ``ppermute`` of the
    ``n_fft - hop``-sample halo per shard — asserted collective-free
    otherwise in the tests (no all-gather of the signal).
    """
    from ..errors import AudioError, ErrorCode
    from ..ops import spectrogram

    n_dev = mesh.shape[axis]
    t = x.shape[-1]
    if x.ndim != 2:
        raise AudioError(
            f"sequence_sharded_spectrogram takes [batch, T], got {x.shape}",
            code=ErrorCode.SHAPE_MISMATCH,
        )
    if t % (n_dev * hop):
        raise AudioError(
            f"T = {t} must divide into {n_dev} shards of whole hops "
            f"(T % (n_devices * hop) == 0; hop = {hop})",
            code=ErrorCode.SHAPE_MISMATCH,
        )
    local_t = t // n_dev
    if local_t < n_fft:
        raise AudioError(
            f"local shard {local_t} < n_fft {n_fft}; use fewer devices or "
            f"longer input",
            code=ErrorCode.SHAPE_MISMATCH,
        )
    halo = n_fft - hop

    def local(xl):
        # xl [batch, local_t]; fetch the right neighbor's first `halo`
        # samples (the last shard receives ppermute's zero fill = the global
        # zero-pad tail convention)
        if halo > 0:
            nxt = jax.lax.ppermute(
                xl[..., :halo], axis,
                perm=[(i + 1, i) for i in range(n_dev - 1)],
            )
            xe = jnp.concatenate([xl, nxt], axis=-1)
        else:
            xe = xl
        # (local_t + halo - n_fft) // hop + 1 == local_t // hop frames
        return spectrogram(
            xe, n_fft, hop, window=window, center=False, power=power,
            precision=precision,
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, axis),
        out_specs=P(None, axis, None),
    )
    xs = jax.device_put(x, NamedSharding(mesh, P(None, axis)))
    return fn(xs)
