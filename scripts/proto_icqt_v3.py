"""Prototype v3: hybrid icqt with per-coset least-squares dual design.

Dual branch: instead of the diagonal painless formula 1/W, solve per
frequency-coset (Walnut representation of the hop-shift-invariant frame
operator) a Tikhonov-regularized min-norm least squares for the dual
spectra. Exact wherever the coset system has rank — including the bottom
bins whose +/- frequency lobes collide under hop-rate aliasing (2f mod
sr/hop inside the bin bandwidth), which the diagonal design cannot fix.

Sin branch: candidate-harmonic scoring + score gate (spurious sidelobe
peaks score badly and are dropped).

Run: PYTHONPATH=/root/repo python scripts/proto_icqt_v3.py
"""
import importlib

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

cqt_mod = importlib.import_module("audioflow_tpu.ops.cqt")

SR = 16000.0
HOP = 256
N_BINS = 84
BPO = 12
FMIN = cqt_mod.FMIN_C1


def hann_spec_table(n=4097, umax=3.0):
    u = np.linspace(0.0, umax, n)
    h = 0.5 * np.sinc(u) + 0.25 * np.sinc(u - 1) + 0.25 * np.sinc(u + 1)
    return u, np.abs(h / h[0])


U_TAB, H_TAB = hann_spec_table()


def h_of(u):
    u = np.clip(np.abs(u), 0, U_TAB[-1])
    return np.maximum(np.interp(u, U_TAB, H_TAB), 1e-7)


def design_ls_dual(k_dual, taper_lo_bin, taper_hi_bin, nd_mult=2, lam_rel=1e-3):
    """Per-coset LS dual bank for bins 0..k_dual-1, with spectral taper
    rho(|f|): 1 below freqs[taper_lo_bin], cos-ramp to 0 at freqs[taper_hi_bin].
    Returns (nd, bank [2*k_dual, nd], rho)."""
    freqs = cqt_mod.cqt_frequencies(N_BINS, FMIN, BPO)
    f0, _groups, onedot = cqt_mod._design(SR, HOP, N_BINS, FMIN, BPO, "hann", 1.0)
    psi = (onedot[:, :k_dual].T.astype(np.float64)
           - 1j * onedot[:, N_BINS:N_BINS + k_dual].T.astype(np.float64))
    nd = f0 * nd_mult
    assert nd % HOP == 0
    t_cosets = nd // HOP  # frames on the design circle
    n_per = HOP  # coset size
    psi_p = np.zeros((k_dual, nd), complex)
    off = nd // 2 - f0 // 2
    psi_p[:, off:off + f0] = psi
    ph = np.fft.fft(psi_p, axis=1)  # [K, nd]
    # measurement rows per coset: C_k(mu) ~ sum_j X(w_j) conj(ph[k, w_j])
    # and conj-coefficient rows:       sum_j X(w_j) ph[k, (-w_j) mod nd]
    k_arr = np.arange(k_dual)
    d_hat = np.zeros((k_dual, nd), complex)  # duals for c_k
    e_hat = np.zeros((k_dual, nd), complex)  # duals for conj(c_k)
    # lambda relative to the PEAK per-coset row energy of the scaled system:
    # rows are (T/nd)*spectra, peak |spectrum| ~= 1, mainlobe ~few members
    scale = t_cosets / nd
    lam = lam_rel * (np.abs(ph).max() * scale) ** 2
    for mu in range(t_cosets):
        w_idx = (mu + t_cosets * np.arange(n_per)) % nd  # coset members
        a1 = np.conj(ph[:, w_idx])                      # [K, n_per]
        a2 = ph[:, (nd - w_idx) % nd]                   # conj rows
        # C_k(mu) = (T/nd) sum_j X(w_j) conj(Psi_k(w_j)) — keep the 1/hop
        a = scale * np.concatenate([a1, a2], axis=0)    # [2K, n_per]
        # min-norm LS: X = A^H (A A^H + lam I)^-1 m  -> dual cols B = that map
        g = a @ a.conj().T
        g.flat[:: g.shape[0] + 1] += lam
        b = np.linalg.solve(g, a).conj().T              # [n_per, 2K]
        d_hat[:, w_idx] += b[:, :k_dual].T
        e_hat[:, w_idx] += b[:, k_dual:].T
    # realness consistency: e_hat should equal reflected-conj of d_hat
    refl = lambda z: np.conj(z[:, (nd - np.arange(nd)) % nd])
    sym_err = np.abs(e_hat - refl(d_hat)).max() / max(np.abs(d_hat).max(), 1e-30)
    # combine: y uses c_k d_k + conj(c_k) e_k == 2 Re{c_k d_sym_k}
    d_sym = 0.5 * (d_hat + refl(e_hat))
    # spectral taper
    fgrid = np.abs(np.fft.fftfreq(nd, d=1.0 / SR))
    f_lo, f_hi = freqs[taper_lo_bin], freqs[taper_hi_bin]
    t = np.clip((np.log(np.maximum(fgrid, 1e-9)) - np.log(f_lo))
                / (np.log(f_hi) - np.log(f_lo)), 0.0, 1.0)
    taper = 0.5 * (1.0 + np.cos(np.pi * t))
    d_sym = d_sym * taper[None, :]
    d = np.fft.ifft(d_sym, axis=1)
    bank = np.concatenate([2.0 * d.real, -2.0 * d.imag], axis=0)

    def rho(f):
        tt = np.clip((np.log(np.maximum(f, 1e-9)) - np.log(f_lo))
                     / (np.log(f_hi) - np.log(f_lo)), 0.0, 1.0)
        return 0.5 * (1.0 + np.cos(np.pi * tt))

    print(f"LS dual: k_dual={k_dual} nd={nd} cosets={t_cosets} "
          f"sym_err={sym_err:.2e}")
    return nd, bank.astype(np.float64), rho


def dual_reconstruct(c, k_dual, nd, bank, length):
    tf = c.shape[0]
    ri = np.concatenate([c[:, :k_dual].real, c[:, :k_dual].imag], axis=1)
    frames = ri @ bank
    y = np.zeros(tf * HOP + nd)
    for t in range(tf):
        y[t * HOP:t * HOP + nd] += frames[t]
    start = nd // 2
    out = np.zeros(length)
    avail = min(length, y.shape[0] - start)
    out[:avail] = y[start:start + avail]
    return out


def sines_reconstruct(c, freqs, lengths, length, rho, k_min,
                      score_gate=0.5, mag_floor=1e-3):
    c = np.asarray(c)
    tf, nb = c.shape
    mag = np.abs(c)
    gmax = mag.max()
    pad = np.pad(mag, ((0, 0), (1, 1)), constant_values=-1.0)
    is_peak = (mag > pad[:, :-2]) & (mag >= pad[:, 2:]) & (mag > mag_floor * gmax)
    is_peak[:, :k_min] = False
    lm = np.log(np.maximum(mag, 1e-12))
    dphi = np.angle(c[1:] * np.conj(c[:-1]))
    dphi = np.concatenate([dphi, dphi[-1:]], axis=0) / (2 * np.pi)
    fr = SR / HOP
    m0 = np.round(freqs[None, :] / fr - dphi)
    cand = m0[:, :, None] + np.arange(-4, 5)[None, None, :]
    f_cand = (cand + dphi[:, :, None]) * fr
    ks = np.arange(nb)
    k_lo, k_up = np.maximum(ks - 1, 0), np.minimum(ks + 1, nb - 1)

    def lH(fc, idx):
        u = (fc - freqs[idx][None, :, None]) * lengths[idx][None, :, None] / SR
        return np.log(h_of(u))

    r_pred_lo = lH(f_cand, ks) - lH(f_cand, k_lo)
    r_pred_up = lH(f_cand, ks) - lH(f_cand, k_up)
    r_obs_lo = (lm - lm[:, k_lo])[:, :, None]
    r_obs_up = (lm - lm[:, k_up])[:, :, None]
    has_lo = (ks > 0)[None, :, None]
    has_up = (ks < nb - 1)[None, :, None]
    score = (np.where(has_lo, (r_pred_lo - r_obs_lo) ** 2, 0.0)
             + np.where(has_up, (r_pred_up - r_obs_up) ** 2, 0.0))
    best = np.argmin(score, axis=2)
    s_best = np.take_along_axis(score, best[:, :, None], axis=2)[:, :, 0]
    f_hat = np.take_along_axis(f_cand, best[:, :, None], axis=2)[:, :, 0]
    f_hat = np.clip(f_hat, 1.0, SR / 2 - 1.0)
    u = (f_hat - freqs[None, :]) * lengths[None, :] / SR
    amp = mag / np.maximum(h_of(u), 0.1)
    wgt = (1.0 - rho(f_hat)) * (s_best < score_gate)
    phase0 = np.angle(c)
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(2 * HOP) / (2 * HOP))
    y = np.zeros(length + 4 * HOP)
    n_rel = np.arange(2 * HOP) - HOP
    for t in range(tf):
        kk = np.nonzero(is_peak[t])[0]
        if len(kk) == 0:
            continue
        ph = (2 * np.pi * f_hat[t, kk, None] * n_rel[None, :] / SR
              + phase0[t, kk, None])
        burst = (wgt[t, kk, None] * amp[t, kk, None] * np.cos(ph)
                 * w[None, :]).sum(0)
        start = t * HOP - HOP + 2 * HOP
        y[start:start + 2 * HOP] += burst
    return y[2 * HOP:2 * HOP + length]


def run():
    freqs = cqt_mod.cqt_frequencies(N_BINS, FMIN, BPO)
    lengths = cqt_mod.cqt_lengths(SR, N_BINS, FMIN, BPO).astype(np.float64)
    painless = lengths >= 3 * HOP
    k_last = int(np.nonzero(painless)[0].max())
    k_dual = min(k_last + 5, N_BINS)          # LS best-effort past painless
    taper_lo, taper_hi = k_last - 1, k_last + 2
    nd, bank, rho = design_ls_dual(k_dual, taper_lo, taper_hi, nd_mult=4)
    k_min = max(taper_lo - 1, 0)
    n = int(SR * 3)
    tvec = np.arange(n) / SR

    def recon(x):
        c = np.asarray(cqt_mod.cqt(jnp.asarray(x), SR, HOP, N_BINS, FMIN, BPO,
                                   output="complex", precision="highest"))[0]
        yd = dual_reconstruct(c, k_dual, nd, bank, n)
        ys = sines_reconstruct(c, freqs, lengths, n, rho, k_min)
        return yd + ys

    def snr(x, y):
        edge = 12000
        xs, ys = x[edge:n - edge], y[edge:n - edge]
        return 10 * np.log10(np.mean(xs ** 2) / max(np.mean((ys - xs) ** 2), 1e-300))

    worst = (1e9, -1)
    for k in range(N_BINS):
        x = np.sin(2 * np.pi * freqs[k] * tvec + 0.7).astype(np.float32)
        s = snr(x, recon(x[None]))
        if s < worst[0]:
            worst = (s, k)
        flag = " <<<" if s < 30 else ""
        print(f"bin {k:2d} f={freqs[k]:8.1f} SNR {s:6.1f} dB{flag}", flush=True)
    print(f"WORST bin-center {worst[0]:.1f} dB at bin {worst[1]}")
    for k in (5, 20, 40, 41, 42, 43, 44, 46, 60, 70, 82):
        for off in (0.25, 0.5):
            f = freqs[k] * 2 ** (off / 12)
            if f > SR / 2:
                continue
            x = np.sin(2 * np.pi * f * tvec + 0.3).astype(np.float32)
            s = snr(x, recon(x[None]))
            print(f"mid-bin k={k}+{off} f={f:7.1f} SNR {s:6.1f} dB")
    x = (0.7 * np.sin(2 * np.pi * freqs[30] * tvec + 0.2)
         + 0.3 * np.sin(2 * np.pi * freqs[78] * tvec + 1.1)).astype(np.float32)
    print(f"two-tone bins 30+78 SNR {snr(x, recon(x[None])):6.1f} dB")


if __name__ == "__main__":
    run()
