"""Full 84-bin icqt SNR sweeps (hybrid AND multirate) on the real TPU.

VERDICT r4 items 1 + 4: the r4 sweep's per-bin SNRs lived in /tmp and died
with the VM; this writes the committed artifact. At the framework defaults
(hop 256 / 84 bins / C1 / 16 kHz):

  * hybrid: tone round-trip SNR at every bin center (the method's BEST
    case — its broadband envelope is the icqt_hybrid_* validate rows);
  * multirate (cqt(multirate=True)): tone SNR at every bin center PLUS the
    broadband rows (800-2000 Hz noise, 150 Hz harmonic complex) the hybrid
    fails.

Appends JSON lines to bench_records/chip_r5_icqt_sweep.jsonl.
Run WITH the axon sitecustomize: PYTHONPATH=/root/repo:/root/.axon_site.
"""

import json
import time

OUT = open("/root/repo/bench_records/chip_r5_icqt_sweep.jsonl", "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


import numpy as np

import jax
import jax.numpy as jnp

from audioflow_tpu import ops

SR, HOP, NB = 16000, 256, 84
T_LEN = 64000
EDGE = 17000

emit(stage="backend", backend=jax.default_backend(), config=f"hop {HOP} / {NB} bins / 16 kHz")

freqs = ops.cqt_frequencies(NB)
n = np.arange(T_LEN)


def snr_rows(y, x):
    e = y[:, EDGE:-EDGE] - x[:, EDGE:-EDGE]
    return 10.0 * np.log10(
        (x[:, EDGE:-EDGE] ** 2).sum(axis=1)
        / np.maximum((e ** 2).sum(axis=1), 1e-30)
    )


def tone_bank(ks):
    return np.stack(
        [np.sin(2 * np.pi * freqs[k] * n / SR + 0.37) for k in ks]
    ).astype(np.float32)


rt_h = jax.jit(
    lambda z: ops.icqt(ops.cqt(z, SR, HOP, NB, output="complex"), SR, HOP, NB, length=T_LEN)
)
rt_m = jax.jit(
    lambda z: ops.icqt(ops.cqt(z, SR, multirate=True, output="complex"), length=T_LEN)
)

for name, rt in (("hybrid", rt_h), ("multirate", rt_m)):
    snrs = np.empty(NB)
    for lo in range(0, NB, 12):  # batch an octave at a time
        ks = list(range(lo, min(lo + 12, NB)))
        xb = tone_bank(ks)
        snrs[lo : lo + len(ks)] = snr_rows(np.asarray(rt(jnp.asarray(xb))), xb)
    worst = int(np.argmin(snrs))
    emit(stage=f"{name}_tone_sweep", snr_db=[round(float(v), 1) for v in snrs],
         worst_bin=worst, worst_db=round(float(snrs[worst]), 1),
         median_db=round(float(np.median(snrs)), 1))

# broadband rows through BOTH inverses
rng = np.random.default_rng(0)
z = rng.standard_normal(T_LEN)
zf = np.fft.rfft(z)
fg = np.fft.rfftfreq(T_LEN, 1.0 / SR)
zf[(fg < 800) | (fg > 2000)] = 0
noise = np.fft.irfft(zf, T_LEN)
noise = (noise / np.abs(noise).max() * 0.5).astype(np.float32)
harm = sum(
    (0.5 / (i + 1)) * np.sin(2 * np.pi * 150.0 * (i + 1) * n / SR) for i in range(12)
).astype(np.float32)
xb = np.stack([noise, harm])
for name, rt in (("hybrid", rt_h), ("multirate", rt_m)):
    s = snr_rows(np.asarray(rt(jnp.asarray(xb))), xb)
    emit(stage=f"{name}_broadband", noise_800_2000_db=round(float(s[0]), 1),
         harm150_db=round(float(s[1]), 1))
