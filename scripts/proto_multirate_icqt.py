"""Prototype: per-octave-hop multirate CQT with an exact (painless) inverse.

VERDICT r4 item 1b: the hybrid icqt at hop 256 / 84 bins is a tone
reconstructor above ~350 Hz (sin-branch discards non-peaky energy; measured
-10.1 dB on 800-2000 Hz noise). This prototype checks the fix: analyze each
octave at its OWN hop h_o <= N_min_o/3 (inside the painless bound), design
ONE joint diagonal dual with per-bin hop weighting

    W(w) = sum_k (1/h_k) (|psi_hat_k(w)|^2 + |psi_hat_k(-w)|^2)

and invert by per-octave OLA of 2 Re{C_k d_k}. All float64 numpy; the
device implementation (ops/cqt.py) reuses these exact banks in f32.

Measures round-trip SNR on: band-limited noise 800-2000 Hz, 100-300 Hz,
a 150 Hz harmonic complex, bin-center tones (0, 40, 60, 83), and full-band
noise 40-4000 Hz.
"""

import numpy as np

import sys

sys.path.insert(0, "/root/repo")
from audioflow_tpu.ops.cqt import FMIN_C1, cqt_frequencies, cqt_lengths
from audioflow_tpu.ops.windows import get_window

SR = 16000
HOP = 256
N_BINS = 84
BPO = 12
WIN = "hann"
FS = 1.0


def design_octave_banks():
    """Per-octave (hop_o, flen, cos, sin) with flen a multiple of hop_o."""
    freqs = cqt_frequencies(N_BINS, FMIN_C1, BPO)
    lengths = cqt_lengths(SR, N_BINS, FMIN_C1, BPO, FS)
    octs = []
    for lo in range(0, N_BINS, BPO):
        hi = min(lo + BPO, N_BINS)
        n_min = int(lengths[lo:hi].min())
        bound = max(1, n_min // 3)
        h = HOP
        s = 0
        while h > bound:
            assert h % 2 == 0, (h, bound)
            h //= 2
            s += 1
        n_max = int(lengths[lo:hi].max())
        flen = h * -(-(n_max + 1) // h)
        cos_b = np.zeros((flen, hi - lo))
        sin_b = np.zeros((flen, hi - lo))
        for j, k in enumerate(range(lo, hi)):
            nk = int(lengths[k])
            w = get_window(WIN, nk, periodic=False).astype(np.float64)
            t = (np.arange(nk) - (nk - 1) / 2.0) / SR
            ang = 2.0 * np.pi * freqs[k] * t
            g = 2.0 / w.sum()
            start = flen // 2 - (nk - 1) // 2
            cos_b[start : start + nk, j] = g * w * np.cos(ang)
            sin_b[start : start + nk, j] = -g * w * np.sin(ang)
        octs.append((h, flen, cos_b, sin_b))
    return octs


def forward(x, octs):
    """center=True multirate CQT: octave o frames centered at t*h_o."""
    out = []
    for h, flen, cos_b, sin_b in octs:
        half = flen // 2
        xp = np.pad(x, (half, flen - half))
        n_frames = len(x) // h + 1
        idx = np.arange(n_frames)[:, None] * h + np.arange(flen)[None, :]
        fr = xp[idx]
        out.append(fr @ cos_b + 1j * (fr @ sin_b))
    return out


def design_duals(octs, nd_mult=2, eps=1e-2, mask_db=40.0):
    f0 = octs[0][1]
    nd = f0 * nd_mult
    # joint W with per-bin hop weighting
    w_pos = np.zeros(nd)
    phs = []
    for h, flen, cos_b, sin_b in octs:
        psi = cos_b.T - 1j * sin_b.T  # [nb, flen]
        psi_p = np.zeros((psi.shape[0], nd), complex)
        off = nd // 2 - flen // 2
        psi_p[:, off : off + flen] = psi
        ph = np.fft.fft(psi_p, axis=1)
        phs.append(ph)
        w_pos += (np.abs(ph) ** 2).sum(0) / h
    w_neg = np.empty_like(w_pos)
    w_neg[0] = w_pos[0]
    w_neg[1:] = w_pos[1:][::-1]
    w_tot = w_pos + w_neg
    banks = []
    for ph in phs:
        amp = np.abs(ph)
        mask = amp >= amp.max(axis=1, keepdims=True) * 10.0 ** (-mask_db / 20.0)
        d_hat = ph * mask / np.maximum(w_tot, eps * w_tot.max())[None, :]
        d = np.fft.ifft(d_hat, axis=1)
        banks.append(np.concatenate([2.0 * d.real, -2.0 * d.imag], axis=0))  # [2nb, nd]
    return nd, banks


def inverse(coeffs, octs, nd, banks, length):
    y = np.zeros(length + nd)
    for (h, flen, _, _), c, bank in zip(octs, coeffs, banks):
        ri = np.concatenate([c.real, c.imag], axis=-1)  # [T, 2nb]
        frames = ri @ bank  # [T, nd]
        for t in range(frames.shape[0]):
            a = t * h  # dual centered at nd//2; center=True -> sample t*h
            lo = a
            hi = min(a + nd, length + nd)
            y[lo:hi] += frames[t, : hi - lo]
    start = nd // 2
    return y[start : start + length]


def snr_db(x, y, lo, hi):
    e = y[lo:hi] - x[lo:hi]
    return 10.0 * np.log10((x[lo:hi] ** 2).sum() / max((e**2).sum(), 1e-300))


def band_noise(rng, n, f_lo, f_hi):
    z = rng.standard_normal(n)
    zf = np.fft.rfft(z)
    f = np.fft.rfftfreq(n, 1 / SR)
    zf[(f < f_lo) | (f > f_hi)] = 0
    x = np.fft.irfft(zf, n)
    return x / np.abs(x).max() * 0.5


def main():
    rng = np.random.default_rng(0)
    octs = design_octave_banks()
    print("octave hops:", [o[0] for o in octs], "flens:", [o[1] for o in octs])
    nd, banks = design_duals(octs)
    print("nd:", nd)
    freqs = cqt_frequencies(N_BINS, FMIN_C1, BPO)
    T = 64000
    edge = nd // 2 + 2048
    sigs = {
        "noise_800_2000": band_noise(rng, T, 800, 2000),
        "noise_100_300": band_noise(rng, T, 100, 300),
        "noise_40_4000": band_noise(rng, T, 40, 4000),
        "harm150": sum(
            (0.5 / (i + 1)) * np.sin(2 * np.pi * 150.0 * (i + 1) * np.arange(T) / SR)
            for i in range(12)
        ),
    }
    for k in (0, 40, 60, 83):
        sigs[f"tone_bin{k}"] = np.sin(2 * np.pi * freqs[k] * np.arange(T) / SR)
    for name, x in sigs.items():
        c = forward(x, octs)
        y = inverse(c, octs, nd, banks, T)
        print(f"{name:16s} SNR = {snr_db(x, y, edge, T - edge):7.2f} dB")


if __name__ == "__main__":
    main()


def trunc_banks(octs, nd, banks, thresh=1e-12):
    """Truncate each octave's dual bank to its significant centered support
    (rows outside keep < thresh of total energy), rounded to a hop multiple."""
    out = []
    for (h, flen, _, _), bank in zip(octs, banks):
        e = (bank**2).sum(0)
        tot = e.sum()
        c = nd // 2
        r = 1
        while r < nd // 2:
            lo, hi = c - r, c + r
            if e[:lo].sum() + e[hi:].sum() < thresh * tot:
                break
            r += h
        span = h * -(-(2 * r) // h)
        lo = c - span // 2
        out.append((lo, bank[:, lo : lo + span]))
    return out


def inverse_trunc(coeffs, octs, nd, tbanks, length):
    y = np.zeros(length + nd)
    for (h, flen, _, _), c, (lo0, bank) in zip(octs, coeffs, tbanks):
        ri = np.concatenate([c.real, c.imag], axis=-1)
        frames = ri @ bank
        span = bank.shape[1]
        for t in range(frames.shape[0]):
            a = t * h + lo0
            lo, hi = max(a, 0), min(a + span, length + nd)
            if hi > lo:
                y[lo:hi] += frames[t, lo - a : hi - a]
    start = nd // 2
    return y[start : start + length]


def main2():
    rng = np.random.default_rng(0)
    octs = design_octave_banks()
    nd, banks = design_duals(octs)
    tb = trunc_banks(octs, nd, banks)
    print("trunc spans:", [b.shape[1] for _, b in tb], "of nd", nd)
    freqs = cqt_frequencies(N_BINS, FMIN_C1, BPO)
    T = 64000
    edge = nd // 2 + 2048
    sigs = {
        "noise_800_2000": band_noise(rng, T, 800, 2000),
        "harm150": sum(
            (0.5 / (i + 1)) * np.sin(2 * np.pi * 150.0 * (i + 1) * np.arange(T) / SR)
            for i in range(12)
        ),
        "tone_bin0": np.sin(2 * np.pi * freqs[0] * np.arange(T) / SR),
        "tone_bin83": np.sin(2 * np.pi * freqs[83] * np.arange(T) / SR),
    }
    for name, x in sigs.items():
        c = forward(x, octs)
        y = inverse_trunc(c, octs, nd, tb, T)
        print(f"trunc {name:16s} SNR = {snr_db(x, y, edge, T - edge):7.2f} dB")


if __name__ == "__main__":
    main2()
