"""Example: edit audio IN the constant-Q domain and resynthesize exactly.

The multirate CQT (``cqt(multirate=True)``) is a true broadband inverse —
unlike the fixed-hop hybrid, arbitrary material round-trips (>= ~40 dB
worst case at the default config), so per-bin edits come back as audio
faithfully. This example zeroes every bin below a cutoff pitch (a
musically-aligned high-pass: whole semitones, not FFT bins) and writes the
result.

    python examples/cqt_edit.py in.wav out.wav [cut_hz]
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from audioflow_tpu import ops
from audioflow_tpu.io import read_audio, write_wav


def main(inp: str, out: str, cut_hz: float = 440.0) -> None:
    data, rate = read_audio(inp)
    if data.ndim == 2:
        data = data.mean(axis=1)
    freqs = ops.cqt_frequencies(84)
    keep = jnp.asarray((freqs >= float(cut_hz)).astype(np.float32))

    @jax.jit
    def edit(x):
        c = ops.cqt(x, rate, multirate=True, output="complex")
        # per-octave coefficient arrays: mask each octave's bins
        octs = []
        lo = 0
        for o in c.octaves:
            nb = o.shape[-1]
            octs.append(o * keep[lo : lo + nb])
            lo += nb
        return ops.icqt(type(c)(octs, c.meta))

    y = np.asarray(edit(jnp.asarray(data, jnp.float32)))
    write_wav(out, y.astype(np.float32), rate)
    print(f"{inp}: zeroed CQT bins below {cut_hz} Hz -> {out} "
          f"({len(y)} samples @ {rate} Hz)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *(float(a) for a in sys.argv[3:]))
