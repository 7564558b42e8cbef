"""Trainable feature frontend: differentiable DSP + learned head.

The kernel library is pure-functional jnp, so the whole DSP chain is
differentiable for free. This module puts a small trainable stack on top of
the fixed STFT: learnable per-mel filter gains, PCEN-style compression with
learnable (alpha, delta, r), and a linear classifier head — a standard
trainable audio frontend. Its ``train_step`` is the framework's canonical
multi-chip training path: batch sharded over the mesh's data axis, parameters
replicated, XLA inserting the gradient all-reduce over ICI.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from ..ops import mel_filterbank, power, stft


@dataclass(frozen=True)
class TrainableFrontend:
    """Static config; parameters live in an explicit pytree."""

    sample_rate: int = 16000
    n_fft: int = 512
    hop: int = 128
    n_mels: int = 64
    n_classes: int = 10
    smoothing: float = 0.04  # PCEN EMA coefficient (fixed; scan carry-free via conv)
    remat: bool = False  # jax.checkpoint the feature extractor: trade FLOPs
    # for HBM when the frontend feeds a large model (the standard TPU move)

    def init_params(self, seed: int = 0) -> dict:
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        return {
            "mel_gain": jnp.ones(self.n_mels, jnp.float32),
            "pcen_alpha": jnp.full((self.n_mels,), 0.98, jnp.float32),
            "pcen_delta": jnp.full((self.n_mels,), 2.0, jnp.float32),
            "pcen_r": jnp.full((self.n_mels,), 0.5, jnp.float32),
            "w": jax.random.normal(k1, (self.n_mels, self.n_classes), jnp.float32) * 0.02,
            "b": jnp.zeros(self.n_classes, jnp.float32),
        }

    def features(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """x [batch, T] -> PCEN log-mel features [batch, frames, n_mels]."""
        fb = jnp.asarray(mel_filterbank(self.n_fft // 2 + 1, self.n_mels, self.sample_rate))
        spec = power(stft(x, self.n_fft, self.hop, center=False))
        mels = jnp.matmul(spec, fb, preferred_element_type=jnp.float32)
        mels = mels * jax.nn.softplus(params["mel_gain"])
        # smoother M via EMA over frames expressed as an associative scan
        s = self.smoothing

        def ema(carry, m):
            carry = (1 - s) * carry + s * m
            return carry, carry

        m0 = mels[..., 0, :]
        _, smooth = jax.lax.scan(ema, m0, jnp.moveaxis(mels, -2, 0))
        smooth = jnp.moveaxis(smooth, 0, -2)
        eps = 1e-6
        alpha = jax.nn.sigmoid(params["pcen_alpha"])
        r = jax.nn.sigmoid(params["pcen_r"])
        delta = jax.nn.softplus(params["pcen_delta"])
        pcen = (mels / (eps + smooth) ** alpha + delta) ** r - delta**r
        return pcen

    def logits(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        feat_fn = jax.checkpoint(self.features) if self.remat else self.features
        feats = feat_fn(params, x).mean(axis=-2)  # [batch, n_mels]
        return feats @ params["w"] + params["b"]

    def loss(self, params: dict, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        lg = self.logits(params, x)
        return optax.softmax_cross_entropy_with_integer_labels(lg, y).mean()


def make_train_step(model: TrainableFrontend, optimizer=None, mesh=None, data_axis: str = "data"):
    """Build a jitted ``train_step(params, opt_state, x, y)``.

    With ``mesh``, the batch (x, y) is sharded over the data axis and params
    are replicated; the mean-gradient all-reduce is the only collective and
    rides ICI — the framework's canonical multi-chip step (SURVEY §2.6).
    """
    optimizer = optimizer or optax.adam(1e-3)

    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(model.loss)(params, x, y)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(step), optimizer

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data2 = NamedSharding(mesh, P(data_axis, None))
    data1 = NamedSharding(mesh, P(data_axis))
    jitted = jax.jit(
        step,
        in_shardings=(repl, repl, data2, data1),
        out_shardings=(repl, repl, repl),
    )
    return jitted, optimizer
