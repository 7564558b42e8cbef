"""Sharding tests on the 8-virtual-device CPU mesh (conftest forces platform)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioflow_tpu import ops
from audioflow_tpu.errors import AudioError
from audioflow_tpu.graph import MelProject, Power, Resample, Stft, chain
from audioflow_tpu.parallel import (
    batch_sharding,
    compile_sharded,
    make_mesh,
    mask_lanes,
    pad_batch,
    shard_batch,
)


def _graph():
    return chain(
        Resample(48000, 16000, "kaiser"),
        Stft(512, 128, center=False),
        Power(),
        MelProject(n_mels=32),
        input_rate=48000,
    )


def test_mesh_has_8_cpu_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_shard_batch_placement(rng):
    mesh = make_mesh()
    x = rng.standard_normal((16, 4800)).astype(np.float32)
    xs = shard_batch(x, mesh)
    assert xs.sharding == batch_sharding(mesh, 2)
    # each device holds 2 rows
    assert xs.addressable_shards[0].data.shape == (2, 4800)


def test_sharded_graph_matches_single_device(rng):
    mesh = make_mesh()
    g = _graph()
    x = rng.standard_normal((8, 48000)).astype(np.float32)
    fn = compile_sharded(g, mesh)
    out = np.asarray(fn(shard_batch(x, mesh)))
    want = np.asarray(g.compile()(jnp.asarray(x)))
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_sharded_output_stays_sharded(rng):
    """No implicit gather: the batch axis sharding propagates to the output."""
    mesh = make_mesh()
    g = _graph()
    x = shard_batch(rng.standard_normal((8, 48000)).astype(np.float32), mesh)
    out = compile_sharded(g, mesh)(x)
    # output [8, frames, mels] should still be sharded on axis 0
    spec = out.sharding.spec
    assert spec[0] == "data"


def test_pad_batch_and_mask(rng):
    mesh = make_mesh()
    x = rng.standard_normal((5, 100)).astype(np.float32)
    xp, mask = pad_batch(x, mesh)
    assert xp.shape[0] == 8 and mask.sum() == 5
    out = jnp.asarray(xp) * 2
    masked, m = mask_lanes(out, mask)
    assert np.asarray(masked)[5:].sum() == 0
    np.testing.assert_allclose(np.asarray(masked)[:5], x * 2, atol=1e-6)


def test_indivisible_batch_raises(rng):
    mesh = make_mesh()
    with pytest.raises(AudioError):
        shard_batch(rng.standard_normal((5, 10)).astype(np.float32), mesh)


def test_2d_mesh():
    mesh = make_mesh(axes=("data", "model"), shape=(4, 2))
    assert mesh.shape == {"data": 4, "model": 2}


def test_vmapped_streaming_scan_sharded(rng):
    """Streaming scan over a sharded batch: per-lane carries stay on-lane."""
    mesh = make_mesh()
    g = chain(Resample(48000, 16000), input_rate=48000)
    chunk = g.chunk_granularity() * 4
    x = rng.standard_normal((8, chunk * 3)).astype(np.float32)
    fn = jax.jit(
        lambda b: g.scan_stream(b, chunk),
        in_shardings=(batch_sharding(mesh, 2),),
    )
    out = np.asarray(fn(shard_batch(x, mesh)))
    want = np.asarray(g.scan_stream(jnp.asarray(x), chunk))
    np.testing.assert_allclose(out, want, atol=1e-5)
