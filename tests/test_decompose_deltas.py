"""HPSS, spectral gating, delta features, PCEN — oracles and behavior."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from audioflow_tpu import ops

FS = 16000


def test_median_filter_matches_scipy(rng):
    x = rng.standard_normal((3, 40, 33)).astype(np.float32)
    for size, axis in ((5, -1), (7, -2), (1, -1), (17, -2)):
        sz = [1, 1, 1]
        sz[axis] = size
        want = ndi.median_filter(x, size=tuple(sz), mode="reflect")
        for impl in ("network", "sort"):
            got = np.asarray(ops.median_filter(jnp.asarray(x), size, axis=axis, impl=impl))
            np.testing.assert_allclose(got, want, atol=0, err_msg=f"{size}/{axis}/{impl}")
    with pytest.raises(ValueError):
        ops.median_filter(jnp.asarray(x), 4)
    with pytest.raises(ValueError):
        ops.median_filter(jnp.asarray(x), 5, impl="quickselect")


def test_median_network_zero_one_principle():
    """The pruned comparator network must route the true median to wire n//2
    for EVERY input — by the 0-1 principle it suffices to check all 2^n
    binary vectors (a min/max network computes the k-th order statistic on
    all inputs iff it does on all 0-1 inputs)."""
    from audioflow_tpu.ops.decompose import median_network

    for n in (3, 5, 7, 9, 17):
        m = np.arange(2**n, dtype=np.uint32)
        wires = [((m >> k) & 1).astype(np.int8) for k in range(n)]
        for i, j in median_network(n):
            lo = np.minimum(wires[i], wires[j])
            wires[j] = np.maximum(wires[i], wires[j])
            wires[i] = lo
        want = (np.stack([((m >> k) & 1) for k in range(n)]).sum(axis=0) > n // 2).astype(np.int8)
        np.testing.assert_array_equal(wires[n // 2], want, err_msg=f"n={n}")


def _tone_plus_clicks(rng):
    """2 s: steady 440 Hz harmonic bed + periodic broadband clicks."""
    t = np.arange(2 * FS) / FS
    x = 0.4 * np.sin(2 * np.pi * 440.0 * t)
    clicks = np.zeros_like(x)
    for k in range(8):
        i = 2000 + k * 3600
        clicks[i : i + 40] = rng.standard_normal(40) * 0.8
    return x.astype(np.float32), clicks.astype(np.float32)


def test_hpss_separates_tone_from_clicks(rng):
    tone, clicks = _tone_plus_clicks(rng)
    x = jnp.asarray(tone + clicks)
    y_h, y_p = ops.hpss(x, 1024, 256)
    y_h, y_p = np.asarray(y_h), np.asarray(y_p)
    assert y_h.shape == y_p.shape == (2 * FS,)
    # the harmonic estimate correlates with the tone, not the clicks
    def corr(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))

    assert corr(y_h, tone) > 0.9, corr(y_h, tone)
    assert corr(y_p, clicks) > 0.5, corr(y_p, clicks)
    # energy at click locations concentrates in the percussive component
    mask = np.abs(clicks) > 0
    assert (y_p[mask] ** 2).sum() > 3 * (y_h[mask] ** 2).sum()


def test_hpss_masks_partition_energy(rng):
    x = jnp.asarray((0.3 * rng.standard_normal(FS)).astype(np.float32))
    spec = ops.stft(x, 512, 128)
    p = np.asarray(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2)
    mh, mp = ops.hpss_mask(jnp.asarray(p))
    mh, mp = np.asarray(mh), np.asarray(mp)
    assert (mh >= 0).all() and (mh <= 1).all() and (mp >= 0).all() and (mp <= 1).all()
    # at margin=1 the Wiener masks sum to ~1 wherever there is energy
    lively = p > 1e-6 * p.max()
    np.testing.assert_allclose((mh + mp)[lively], 1.0, atol=1e-3)


def test_spectral_gate_improves_snr(rng):
    t = np.arange(2 * FS) / FS
    clean = (0.4 * np.sin(2 * np.pi * 800.0 * t)).astype(np.float32)
    noise = (0.05 * rng.standard_normal(2 * FS)).astype(np.float32)
    noisy = clean + noise
    # explicit noise clip
    y = np.asarray(
        ops.spectral_gate(jnp.asarray(noisy), 1024, 256, noise=jnp.asarray(noise))
    )
    def snr(sig):
        err = sig - clean
        return 10 * np.log10((clean**2).sum() / ((err**2).sum() + 1e-12))

    assert snr(y) > snr(noisy) + 4.0, (snr(noisy), snr(y))
    # self-estimated profile: a leading noise-only region supplies the
    # quietest frames; the gated result must still beat the noisy input
    gap = noisy.copy()
    gap[: FS // 4] = noise[: FS // 4]
    y2 = np.asarray(ops.spectral_gate(jnp.asarray(gap), 1024, 256, quantile=0.1))
    # compare on the second half (clean tone region in both)
    def snr_tail(sig):
        err = sig[FS:] - clean[FS:]
        return 10 * np.log10((clean[FS:] ** 2).sum() / ((err**2).sum() + 1e-12))

    assert snr_tail(y2) > snr_tail(noisy) + 4.0, (snr_tail(noisy), snr_tail(y2))
    # prop_decrease=0 is a no-op gate
    y3 = np.asarray(ops.spectral_gate(jnp.asarray(noisy), 1024, 256, prop_decrease=0.0))
    np.testing.assert_allclose(y3[512:-512], noisy[512:-512], atol=2e-4)


def test_delta_matches_numpy_oracle(rng):
    feats = rng.standard_normal((2, 30, 13)).astype(np.float32)
    width, n = 9, 4
    got = np.asarray(ops.delta(jnp.asarray(feats), width))
    denom = 2 * sum(i * i for i in range(1, n + 1))
    padded = np.pad(feats, ((0, 0), (n, n), (0, 0)), mode="edge")
    want = np.zeros_like(feats)
    for t in range(feats.shape[1]):
        for i in range(1, n + 1):
            want[:, t] += i * (padded[:, t + n + i] - padded[:, t + n - i])
    want /= denom
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # order-2 == delta applied twice
    d2 = np.asarray(ops.delta(jnp.asarray(feats), width, order=2))
    dd = np.asarray(ops.delta(ops.delta(jnp.asarray(feats), width), width))
    np.testing.assert_allclose(d2, dd, rtol=1e-5, atol=1e-6)


def test_add_deltas_layout(rng):
    feats = rng.standard_normal((30, 13)).astype(np.float32)
    out = np.asarray(ops.add_deltas(jnp.asarray(feats)))
    assert out.shape == (30, 39)
    np.testing.assert_array_equal(out[:, :13], feats)
    np.testing.assert_allclose(out[:, 13:26], np.asarray(ops.delta(jnp.asarray(feats))), atol=0)


def test_delta_constant_is_zero_linear_is_slope():
    t = np.arange(20, dtype=np.float32)
    feats = np.stack([np.ones(20, np.float32), 3.0 * t], axis=-1)  # [T, 2]
    d = np.asarray(ops.delta(jnp.asarray(feats), 9))
    np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-6)
    # interior of a linear ramp: slope exactly
    np.testing.assert_allclose(d[4:-4, 1], 3.0, atol=1e-4)


def test_pcen_matches_serial_oracle(rng):
    e = np.abs(rng.standard_normal((2, 25, 8))).astype(np.float32)
    s, alpha, dlt, r, eps = 0.1, 0.98, 2.0, 0.5, 1e-6
    got = np.asarray(ops.pcen(jnp.asarray(e), s, alpha, dlt, r, eps))
    m = np.zeros_like(e, dtype=np.float64)
    e64 = e.astype(np.float64)
    for t in range(e.shape[1]):
        prev = e64[:, 0] if t == 0 else m[:, t - 1]
        m[:, t] = (1 - s) * prev + s * e64[:, t]
    want = (e64 / (eps + m) ** alpha + dlt) ** r - dlt**r
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pcen_scale_invariance(rng):
    """PCEN's point: per-channel AGC. At alpha=1 the normalization is exactly
    scale-free (E/M is invariant); at the default alpha=0.98 a 100x input
    scale moves the ratio by the designed 100^(1-alpha) = 9.6% — assert both
    the strict identity and the designed bound."""
    e = 10.0 + np.abs(rng.standard_normal((20, 8))).astype(np.float32)
    a1 = np.asarray(ops.pcen(jnp.asarray(e), alpha=1.0))
    b1 = np.asarray(ops.pcen(jnp.asarray(100.0 * e), alpha=1.0))
    np.testing.assert_allclose(a1, b1, rtol=1e-4, atol=1e-5)
    a = np.asarray(ops.pcen(jnp.asarray(e)))
    b = np.asarray(ops.pcen(jnp.asarray(100.0 * e)))
    assert np.abs(a - b).max() < 0.12 * np.abs(a).max()


def test_effect_nodes_offline_and_spec_roundtrip(rng):
    """Hpss/SpectralGate/Pcen/Deltas nodes: offline-only flags, graph
    execution, GraphSpec round-trip."""
    from audioflow_tpu.config import graph_from_spec, graph_to_spec
    from audioflow_tpu.graph import Deltas, Hpss, MelProject, Pcen, SpectralGate, Spectrogram, chain

    t = np.arange(FS) / FS
    x = jnp.asarray((0.4 * np.sin(2 * np.pi * 440.0 * t)
                     + 0.05 * rng.standard_normal(FS)).astype(np.float32))

    g1 = chain(Hpss("harmonic", 512, 128), input_rate=FS)
    assert not g1.streamable
    y = np.asarray(g1.chain(x))
    want_h, _ = ops.hpss(x, 512, 128)
    np.testing.assert_allclose(y, np.asarray(want_h), atol=1e-6)

    g2 = chain(SpectralGate(512, 128), input_rate=FS)
    assert np.isfinite(np.asarray(g2.chain(x))).all()

    g3 = chain(
        Spectrogram(512, 128, center=False),
        MelProject(n_mels=40, log=None),
        Pcen(),
        Deltas(width=5, orders=(1,)),
        input_rate=FS,
    )
    assert not g3.streamable
    out = np.asarray(g3.chain(x))
    assert out.shape[-1] == 80  # 40 static + 40 delta
    g3b = graph_from_spec(graph_to_spec(g3))
    out_b = np.asarray(g3b.chain(x))
    np.testing.assert_array_equal(out, out_b)
    assert g3b.nodes[-1].orders == (1,)

    with pytest.raises(Exception):
        Hpss("sideways")


def test_pcen_node_streams_exactly(rng):
    """PCEN streaming: M carry + first_index reseed == offline warm start,
    through a latency-bearing upstream (Spectrogram overlap)."""
    from audioflow_tpu.graph import MelProject, Pcen, Spectrogram, chain

    g = chain(
        Spectrogram(512, 128, center=False),
        MelProject(n_mels=40, log=None),
        Pcen(n_bins=40),
        input_rate=FS,
    )
    assert g.streamable
    x = (0.3 * rng.standard_normal(16 * 2048) ** 2).astype(np.float32)
    offline = np.asarray(g.chain(jnp.asarray(x)))
    chunk = g.chunk_granularity() * 8
    streamed = np.asarray(g.scan_stream(jnp.asarray(x), chunk))
    lat = g.stream_latency(chunk)
    n = min(streamed.shape[0] - lat, offline.shape[0])
    np.testing.assert_allclose(streamed[lat : lat + n], offline[:n], rtol=1e-4, atol=1e-5)
    # offline-only without n_bins
    g2 = chain(Spectrogram(512, 128, center=False), MelProject(n_mels=40, log=None), Pcen(), input_rate=FS)
    assert not g2.streamable


def test_spectral_features_flux_streams_exactly(rng):
    from audioflow_tpu.graph import SpectralFeatures, Spectrogram, chain

    g = chain(
        Spectrogram(512, 128, center=False, power=False),
        SpectralFeatures(("flux", "centroid"), n_bins=257),
        input_rate=FS,
    )
    assert g.streamable
    x = (0.3 * rng.standard_normal(16 * 2048)).astype(np.float32)
    offline = np.asarray(g.chain(jnp.asarray(x)))
    chunk = g.chunk_granularity() * 8
    streamed = np.asarray(g.scan_stream(jnp.asarray(x), chunk))
    lat = g.stream_latency(chunk)
    n = min(streamed.shape[0] - lat, offline.shape[0])
    np.testing.assert_allclose(streamed[lat : lat + n], offline[:n], rtol=1e-4, atol=1e-5)
    assert streamed[lat, 0] == 0.0  # frame 0 fluxes against itself


def test_deltas_node_streams_exactly(rng):
    """Order-1 Deltas streaming: width//2-frame latency, prev-frames carry,
    edge replication at the stream's frame 0 matches offline."""
    from audioflow_tpu.graph import Deltas, MelProject, Spectrogram, chain

    g = chain(
        Spectrogram(512, 128, center=False),
        MelProject(n_mels=24),
        Deltas(width=9, orders=(1,), n_bins=24),
        input_rate=FS,
    )
    assert g.streamable
    x = (0.3 * rng.standard_normal(16 * 2048)).astype(np.float32)
    offline = np.asarray(g.chain(jnp.asarray(x)))
    chunk = g.chunk_granularity() * 8
    streamed = np.asarray(g.scan_stream(jnp.asarray(x), chunk))
    lat = g.stream_latency(chunk)
    n = min(streamed.shape[0] - lat, offline.shape[0])
    assert n > 50
    np.testing.assert_allclose(streamed[lat : lat + n], offline[:n], rtol=1e-4, atol=1e-5)
    # default (1, 2) stays offline-only
    from audioflow_tpu.errors import AudioError

    g2 = chain(Spectrogram(512, 128, center=False), MelProject(n_mels=24), Deltas(n_bins=24), input_rate=FS)
    assert not g2.streamable
    with pytest.raises(AudioError):
        g2.init_state(1024)


# ---------------------------------------------------------------------------
# NMF
# ---------------------------------------------------------------------------


def test_nmf_reconstruction_improves_and_nonneg(rng):
    # planted rank-4 nonnegative target: the fit should approach the (tiny)
    # noise floor, far below the 1-iteration error
    ht = rng.random((30, 4)).astype(np.float32)
    wt = rng.random((4, 40)).astype(np.float32)
    s = (ht @ wt + 0.01 * rng.random((30, 40))).astype(np.float32)
    h1, w1 = ops.nmf(jnp.asarray(s), 4, n_iter=1)
    h, w = ops.nmf(jnp.asarray(s), 4, n_iter=300)
    e1 = float(np.linalg.norm(np.asarray(h1 @ w1) - s))
    e = float(np.linalg.norm(np.asarray(h @ w) - s))
    assert e < 0.2 * e1, (e1, e)
    assert (np.asarray(h) >= 0).all() and (np.asarray(w) >= 0).all()


def test_nmf_recovers_planted_two_sources(rng):
    # two disjoint spectral templates with independent on/off activations
    f, t = 32, 60
    w_true = np.zeros((2, f))
    w_true[0, 4:8] = [1, 2, 2, 1]
    w_true[1, 20:24] = [2, 1, 1, 2]
    h_true = np.zeros((t, 2))
    h_true[10:25, 0] = 1.0
    h_true[35:55, 1] = 1.0
    s = (h_true @ w_true).astype(np.float32) + 1e-4
    h, w = ops.nmf(jnp.asarray(s), 2, n_iter=400)
    h, w = np.asarray(h), np.asarray(w)
    # match components by template correlation, then check activations
    order = [int(np.argmax([np.dot(w[k], w_true[j]) for j in range(2)]))
             for k in range(2)]
    assert sorted(order) == [0, 1], "components did not separate"
    for k, j in enumerate(order):
        act = h[:, k] / max(h[:, k].max(), 1e-9)
        on = act > 0.5
        want_on = h_true[:, j] > 0.5
        assert (on == want_on).mean() > 0.9


def test_nmf_kl_and_batched(rng):
    s = (rng.random((2, 20, 16)) ** 2).astype(np.float32)
    h, w = ops.nmf(jnp.asarray(s), 3, n_iter=50, loss="kl")
    assert h.shape == (2, 20, 3) and w.shape == (2, 3, 16)
    rec = np.asarray(h @ w)
    assert np.isfinite(rec).all() and (rec >= 0).all()
    with pytest.raises(ValueError):
        ops.nmf(jnp.zeros((4, 4)), 0)
    with pytest.raises(ValueError):
        ops.nmf(jnp.zeros((4, 4)), 2, loss="itakura")


def test_nmf_separate_two_tones(rng):
    sr = 8000
    t = np.arange(2 * sr) / sr
    a = np.where((t % 1.0) < 0.5, 0.5 * np.sin(2 * np.pi * 250 * t), 0.0)
    b = np.where((t % 1.0) >= 0.5, 0.4 * np.sin(2 * np.pi * 1750 * t), 0.0)
    x = (a + b).astype(np.float32)
    comps, h, w = ops.nmf_separate(jnp.asarray(x), 2, 512, 128, n_iter=150)
    comps = np.asarray(comps)
    assert comps.shape[0] == 2
    # components sum back to (the ISTFT-consistent) input
    rec = comps.sum(0)
    n = min(len(rec), len(x))
    assert np.linalg.norm(rec[256:n-256] - x[256:n-256]) / np.linalg.norm(x) < 0.05
    # each component correlates with one source, not the other
    def c(u, v):
        n2 = min(len(u), len(v))
        return abs(np.dot(u[:n2], v[:n2])) / (np.linalg.norm(u[:n2]) * np.linalg.norm(v[:n2]) + 1e-9)
    pair = [(c(comps[k], a), c(comps[k], b)) for k in range(2)]
    k_a = int(np.argmax([p[0] for p in pair]))
    assert pair[k_a][0] > 0.9 and pair[1 - k_a][1] > 0.9, pair
    with pytest.raises(ValueError):
        ops.nmf_separate(jnp.zeros((2, 100)))
