"""IMM — Durrieu's source/filter NMF melody model, pure jnp.

Re-design of imm/tf_imm.py (mono melody chain):
  hatSX = (WGAMMA @ HGAMMA @ HPHI) * (WF0 @ HF0) + WM @ HM
with multiplicative Itakura-Saito updates for HF0, HPHI, HM, HGAMMA, WM per
iteration (exact update order and renormalizations of tf_imm_fn,
imm/tf_imm.py:205-352), 100 iterations with patience-2 early stopping on
the IS divergence. All updates are dense matmuls -> MXU.

Dictionaries:
- WF0: KLGLOTT88 glottal-flow spectra per f0 on a 20-bins-per-semitone grid
  100..800 Hz (U=721), column-max normalized (imm/wf0.py:4-59,
  imm/tf_imm.py:168-188),
- WGAMMA: 75%-overlapping Hann filterbank, P=30 bases (imm/wgamma.py:4-41).

Melody outputs:
- `energies_for_f0s` — per-bin Wiener energies, vectorized to one matmul
  (the reference loops u=0..720, imm/tf_imm.py:636-657),
- `logits` — log10 energies + 6 over the 721-bin grid (:659-678),
- `process_HF0` — log-HF0 observations for the "original" decode (:71-88),
- `voicing_detection` — melody-band Wiener energies + cumulative-energy
  threshold 5.84e-4 (:705-756).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend.stft import SinebellSTFT
from ..hmm.params import imm_transition_matrix


@dataclasses.dataclass(frozen=True)
class IMMConfig:
    w: int = 2048
    h: int = 256
    fs: int = 44100
    niters: int = 100
    patient_iters: int = 2
    R: int = 40  # accompaniment bases
    P: int = 30  # filterbank bases
    K: int = 10  # filter shapes
    fmin: float = 100.0
    fmax: float = 800.0
    bins_per_note: int = 20
    Oq: float = 0.25
    eps: float = 1e-20

    @property
    def F(self) -> int:
        return self.w // 2 + 1

    @property
    def U(self) -> int:
        u = 12 * self.bins_per_note * np.log2(self.fmax / self.fmin)
        return int(np.ceil(u)) + 1


def klglott88_spectrum(f0: float, fs: int, n_samples: int, Oq: float) -> np.ndarray:
    """Power spectrum of a KLGLOTT88 glottal pulse train windowed by a
    sinebell (imm/wf0.py:18-59, constant-E variant)."""
    j2pi = 1j * 2 * np.pi
    n_hs = int(np.floor(fs / 2.0 / f0))
    s = j2pi * np.arange(1, n_hs + 1) * Oq
    one_over_s = 1.0 / s
    ems = np.exp(-s)
    chs = Oq * one_over_s * (
        ems + 2.0 * (1.0 + 2.0 * ems) * one_over_s - 6.0 * (1.0 - ems) * one_over_s**2
    )
    ts = np.arange(n_samples)
    hf0t = (np.arange(1, n_hs + 1) * (f0 / float(fs)))[:, None] * ts[None, :]
    waveform = (chs.real[:, None] * np.cos(2 * np.pi * hf0t)) - (
        chs.imag[:, None] * np.sin(2 * np.pi * hf0t)
    )
    waveform = waveform.sum(axis=0)
    window = np.sin(np.pi * np.arange(n_samples) / n_samples)
    return np.abs(np.fft.rfft(waveform * window)) ** 2


def gen_WF0(config: IMMConfig) -> tuple[np.ndarray, np.ndarray]:
    """(f0 grid [U], WF0 [F, U] column-max-normalized)."""
    f0s = config.fmin * 2.0 ** (
        np.arange(config.U) / float(12 * config.bins_per_note)
    )
    cols = [klglott88_spectrum(f0, config.fs, config.w, config.Oq) for f0 in f0s]
    WF0 = np.stack(cols, axis=-1)
    WF0 = WF0 / WF0.max(axis=0)[None, :]
    return f0s, WF0.astype(np.float32)


def gen_WGAMMA(n_freq_bins: int, n_bases: int, overlap: float = 0.75) -> np.ndarray:
    """Overlapping Hann filterbank [F, P] (imm/wgamma.py:4-41)."""
    Ob = 1.0 - overlap
    n = int(np.ceil(1.0 / Ob))
    Ob = 1.0 / n
    O = 1.0 - Ob
    w = float(n_freq_bins) / ((n_bases - 1) * Ob + 1 - 2 * O)
    w = int(np.ceil(w))
    if w % 2 != 0:
        w -= 1
    centers = ((np.arange(n_bases) * Ob + (Ob - O) / 2.0) * w).astype(np.int64)
    WGAMMA = np.zeros((n_freq_bins, n_bases))
    hL = w // 2
    window = np.hanning(w)
    for p in range(n_bases):
        s = centers[p] - hL
        for hann_p in range(w):
            real_p = s + hann_p
            if 0 <= real_p < n_freq_bins:
                WGAMMA[real_p, p] = window[hann_p]
    return WGAMMA.astype(np.float32)


class IMM:
    """The NMF engine + melody chain. Stateless per track; the NMF is fitted
    per recording at inference (no learned weights)."""

    def __init__(self, config: IMMConfig = IMMConfig()):
        self.config = config
        self.f0s, self.WF0 = gen_WF0(config)
        self.WGAMMA = gen_WGAMMA(config.F, config.P, 0.75)
        self.stft = SinebellSTFT(w=config.w, h=config.h)
        self.transition_matrix = imm_transition_matrix(
            bins_per_semitone=config.bins_per_note, n_bins=config.U
        )
        self._iter_fn = jax.jit(self._iteration)
        self._fit_fn = jax.jit(self._fit_loop)
        self._stereo_fit_fn = jax.jit(self._stereo_fit_loop)

    # ------------------------------------------------------------------
    def _iteration(self, SX, HGAMMA, HPHI, HF0, WM, HM, n_real=None):
        """One multiplicative-update sweep (imm/tf_imm.py:243-321 order).

        n_real: number of real frame columns when the inputs carry
        zero-padded bucket columns (see fit and _pad_fix: every per-frame
        denominator is pinned to 1.0 in padded columns so XLA's fused
        division chains never overflow; real columns are untouched and the
        zero H columns keep padded frames out of every cross-frame sum)."""
        cfg = self.config
        eps = jnp.float32(cfg.eps)
        fix, fix1 = self._pad_fix(SX.shape[1], n_real)
        WGAMMA = jnp.asarray(self.WGAMMA)
        WF0 = jnp.asarray(self.WF0)

        WPHI = WGAMMA @ HGAMMA
        SPHI = WPHI @ HPHI
        SF0 = WF0 @ HF0
        SM = WM @ HM
        hatSX = fix(SPHI * SF0 + SM)

        # HF0
        PSX = WF0.T @ (SPHI * SX / (hatSX**2 + eps))
        QSX = fix(WF0.T @ (SPHI / (hatSX + eps)))
        HF0 = HF0 * PSX / (QSX + eps)
        SF0 = WF0 @ HF0
        SV = SPHI * SF0
        hatSX = fix(SV + SM)

        # HPHI (+ renorm into HF0)
        PSX = WPHI.T @ (SF0 * SX / (hatSX**2 + eps))
        QSX = fix(WPHI.T @ (SF0 / (hatSX + eps)))
        HPHI = HPHI * PSX / (QSX + eps)
        norm = fix1(jnp.sum(HPHI, axis=0))
        HPHI = HPHI / (norm + eps)[None, :]
        HF0 = HF0 * norm[None, :]
        SPHI = WPHI @ HPHI
        SF0 = WF0 @ HF0
        SV = SPHI * SF0
        hatSX = fix(SV + SM)

        # HM
        PSX = WM.T @ (SX / (hatSX**2 + eps))
        QSX = fix(WM.T @ (1.0 / (hatSX + eps)))
        HM = HM * PSX / (QSX + eps)
        SM = WM @ HM
        hatSX = fix(SV + SM)

        # HGAMMA (+ renorms into HPHI then HF0)
        PSX = WGAMMA.T @ (SF0 * SX / (hatSX**2 + eps)) @ HPHI.T
        QSX = WGAMMA.T @ (SF0 / (hatSX + eps)) @ HPHI.T
        HGAMMA = HGAMMA * PSX / (QSX + eps)
        norm = jnp.sum(HGAMMA, axis=0)
        HGAMMA = HGAMMA / (norm + eps)[None, :]
        HPHI = HPHI * norm[:, None]
        norm = fix1(jnp.sum(HPHI, axis=0))
        HPHI = HPHI / (norm + eps)[None, :]
        HF0 = HF0 * norm[None, :]
        WPHI = WGAMMA @ HGAMMA
        SPHI = WPHI @ HPHI
        SF0 = WF0 @ HF0
        SV = SPHI * SF0
        hatSX = fix(SV + SM)

        # WM (+ renorm into HM)
        PSX = (SX / (hatSX**2 + eps)) @ HM.T
        QSX = (1.0 / (hatSX + eps)) @ HM.T
        WM = WM * PSX / (QSX + eps)
        norm = jnp.sum(WM, axis=0)
        WM = WM / (norm + eps)[None, :]
        HM = HM * norm[:, None]
        SM = WM @ HM
        hatSX = fix(SV + SM)

        err = self._is_divergence(SX, hatSX, n_real)
        return (HGAMMA, HPHI, HF0, WM, HM), (WPHI, SPHI, SF0, SV, SM, hatSX), err

    def _is_divergence(self, X, Y, n_real=None):
        """Itakura-Saito divergence (mean over entries, imm/tf_imm.py:330).

        n_real (traced scalar): number of REAL frame columns when X/Y carry
        padded bucket columns (see fit) — those are masked out and the
        result is the mean over the real entries."""
        eps = jnp.float32(self.config.eps)
        t = (X + eps) / (Y + eps)
        if n_real is None:
            return jnp.mean(-jnp.log(t) + t) - 1.0
        d = (-jnp.log(t) + t) - 1.0
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (1, X.shape[1]), 1)
            < jnp.asarray(n_real, jnp.int32)
        )
        d = jnp.where(valid, d, 0.0)
        return jnp.sum(d) / (X.shape[0] * jnp.asarray(n_real, jnp.float32))

    def _keep_best_while(self, iterate_fn, state0):
        """Device-side patience loop shared by the mono/stereo fits.

        The reference iterates on the host, reading the IS divergence
        after every sweep to drive the patience-2 early stop
        (imm/tf_imm.py:205-352 + the fit loops of imm/main_imm.py). Through
        the TPU's async host that read costs a full round trip per
        iteration — measured 22 ms of a 26 ms iteration at N=8192 frames
        on v5e (scripts/tpu_imm_bench.py). This loop keeps the patience
        counter, best-state selection, and early stop inside one
        `lax.while_loop`, with identical semantics: strict `<` improvement,
        the first iteration always accepted, stop after `patient_iters`
        non-improving sweeps or `niters` total."""
        cfg = self.config

        def cond(carry):
            it, since, _, _, _ = carry
            return jnp.logical_and(it < cfg.niters, since < cfg.patient_iters)

        def body(carry):
            it, since, min_err, state, best = carry
            new_state, err = iterate_fn(state)
            better = jnp.logical_or(it == 0, err < min_err)
            best_state, best_err = best
            best_state = jax.tree.map(
                lambda n, b: jnp.where(better, n, b), new_state, best_state
            )
            best = (best_state, jnp.where(better, err, best_err))
            min_err = jnp.where(better, err, min_err)
            since = jnp.where(better, jnp.int32(0), since + 1)
            return it + 1, since, min_err, new_state, best

        init = (
            jnp.int32(0),
            jnp.int32(0),
            jnp.float32(jnp.inf),
            state0,
            (state0, jnp.float32(jnp.inf)),
        )
        it, _, _, _, (best_state, best_err) = jax.lax.while_loop(cond, body, init)
        return best_state, best_err, it

    def _aux_from_state(self, HGAMMA, HPHI, HF0, WM, HM):
        """The mono aux spectra as pure functions of the factors — the same
        expressions the _iteration tail assembles incrementally (asserted
        equal in tests, so the two cannot drift apart silently)."""
        WGAMMA = jnp.asarray(self.WGAMMA)
        WF0 = jnp.asarray(self.WF0)
        WPHI = WGAMMA @ HGAMMA
        SPHI = WPHI @ HPHI
        SF0 = WF0 @ HF0
        SM = WM @ HM
        SV = SPHI * SF0
        hatSX = SV + SM
        return WPHI, SPHI, SF0, SV, SM, hatSX

    def _fit_loop(self, SX, HGAMMA, HPHI, HF0, WM, HM, n_real):
        def iterate(state):
            new_state, _, err = self._iteration(SX, *state, n_real=n_real)
            return new_state, err

        best_state, best_err, it = self._keep_best_while(
            iterate, (HGAMMA, HPHI, HF0, WM, HM)
        )
        return best_state, self._aux_from_state(*best_state), best_err, it

    @staticmethod
    def _frame_bucket(N: int) -> int:
        """Padded frame count: geometric buckets bound the number of
        compiled fit shapes on a mixed-length corpus (the reference fits
        per arbitrary track length, imm/main_imm.py:1139-1180; every
        distinct N here would be a fresh 30-300 s remote TPU compile)."""
        from ..utils import shape_bucket

        return shape_bucket(N, quantum=128)

    @staticmethod
    def _pad_fix(n_cols: int, n_real):
        """Returns (fix, fix1) pinning padded frame columns to 1.0 — fix for
        [*, N] arrays, fix1 for [N] vectors (both identity when n_real is
        None). Applied to every per-frame DENOMINATOR (hatSX, the per-frame
        QSX factors, the HPHI column norms): padded columns would otherwise
        be exact zeros there, and XLA's fused division chains combine the
        resulting 1/eps-scale reciprocals into overflow -> inf, which the
        adjacent zero numerators turn into 0*inf = NaN that cross-frame
        matmuls then spread everywhere (observed on the CPU backend; the
        op-by-op de-optimized path is clean). Pinning to 1.0 keeps every
        denominator normal-scale; the padded-column numerators stay exact
        zeros, so padded columns still contribute exactly zero to every
        cross-frame sum and real columns are untouched."""
        if n_real is None:
            ident = lambda Y: Y  # noqa: E731
            return ident, ident
        n32 = jnp.asarray(n_real, jnp.int32)
        valid2 = jax.lax.broadcasted_iota(jnp.int32, (1, n_cols), 1) < n32
        valid1 = jnp.arange(n_cols, dtype=jnp.int32) < n32
        fix = lambda Y: jnp.where(valid2, Y, jnp.float32(1.0))  # noqa: E731
        fix1 = lambda v: jnp.where(valid1, v, jnp.float32(1.0))  # noqa: E731
        return fix, fix1

    @staticmethod
    def _pad_frames(M, N_pad: int):
        """Zero-pad frame columns of [*, N] to N_pad. Zero H-columns stay
        exactly zero through every multiplicative update and contribute
        exactly zero to all cross-frame sums (WM/HGAMMA/alpha/beta updates
        and the masked IS divergence); the real columns evolve as at the
        unpadded shape up to reduction-order ulp (XLA reduction trees
        depend on the padded extent — tests/test_bucketing.py pins the
        tolerance)."""
        return jnp.pad(M, ((0, 0), (0, N_pad - M.shape[1])))

    def fit(self, SX, seed: int = 0) -> dict:
        """Run the NMF on a power spectrogram SX [N, F] (time-major, as the
        STFT returns). Returns the best-IS-divergence factor dict with
        state-major [F, N]/[U, N] layouts like the reference. The whole
        patience loop runs on device (see _keep_best_while); frames are
        zero-padded to a shape bucket (exact — see _pad_frames)."""
        cfg = self.config
        SX = jnp.asarray(SX, jnp.float32).T  # [F, N]
        N = SX.shape[1]
        N_pad = self._frame_bucket(N)
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 5)
        # random inits are drawn at the TRUE N (bucket-independent), then
        # zero-padded, so the fit result does not depend on the bucket
        HGAMMA = jnp.abs(jax.random.normal(ks[0], (cfg.P, cfg.K)))
        HPHI = self._pad_frames(jnp.abs(jax.random.normal(ks[1], (cfg.K, N))), N_pad)
        HF0 = self._pad_frames(jnp.abs(jax.random.normal(ks[2], (cfg.U, N))), N_pad)
        WM = jnp.abs(jax.random.normal(ks[3], (cfg.F, cfg.R)))
        HM = self._pad_frames(jnp.abs(jax.random.normal(ks[4], (cfg.R, N))), N_pad)
        SX = self._pad_frames(SX, N_pad)

        (HGAMMA, HPHI, HF0, WM, HM), aux, err, _ = self._fit_fn(
            SX, HGAMMA, HPHI, HF0, WM, HM, jnp.int32(N)
        )
        WPHI, SPHI, SF0, SV, SM, hatSX = aux
        cut = lambda M: M[:, :N]  # noqa: E731 — drop padded frame columns
        return dict(
            HGAMMA=HGAMMA, HPHI=cut(HPHI), HF0=cut(HF0), WM=WM, HM=cut(HM),
            WPHI=WPHI, SPHI=cut(SPHI), SF0=cut(SF0), SV=cut(SV), SM=cut(SM),
            hatSX=cut(hatSX), err=float(err),
        )

    # ------------------------------------------------------------------
    def _stereo_iteration(self, SXL, SXR, HGAMMA, HPHI, HF0, WM, HM,
                          alphaL, alphaR, betaL, betaR, n_real=None):
        """One stereo sweep with per-channel gains (imm/tf_imm.py:354-618):
        updates HF0/HPHI/HM/HGAMMA/WM plus the channel gains alphaL/R and
        per-basis panning betaL/R (exponent-0.1 damped updates).
        n_real: see _iteration (padded-column hatSX pinning)."""
        cfg = self.config
        eps = jnp.float32(cfg.eps)
        fix, fix1 = self._pad_fix(SXL.shape[1], n_real)
        WGAMMA = jnp.asarray(self.WGAMMA)
        WF0 = jnp.asarray(self.WF0)

        betaL2, betaR2 = betaL**2, betaR**2
        WPHI = WGAMMA @ HGAMMA
        SPHI = WPHI @ HPHI
        SPHIL = alphaL**2 * SPHI
        SPHIR = alphaR**2 * SPHI
        SF0 = WF0 @ HF0
        SML = (WM * betaL2[None, :]) @ HM
        SMR = (WM * betaR2[None, :]) @ HM
        hatSXL = fix(SPHIL * SF0 + SML)
        hatSXR = fix(SPHIR * SF0 + SMR)

        # HF0
        PSX = WF0.T @ (
            SPHIL * SXL / (hatSXL**2 + eps) + SPHIR * SXR / (hatSXR**2 + eps)
        )
        QSX = fix(WF0.T @ (SPHIL / (hatSXL + eps) + SPHIR / (hatSXR + eps)))
        HF0 = HF0 * PSX / (QSX + eps)
        SF0 = WF0 @ HF0
        SF0L, SF0R = alphaL**2 * SF0, alphaR**2 * SF0
        hatSXL = fix(SPHI * SF0L + SML)
        hatSXR = fix(SPHI * SF0R + SMR)

        # HPHI
        PSX = WPHI.T @ (
            SF0L * SXL / (hatSXL**2 + eps) + SF0R * SXR / (hatSXR**2 + eps)
        )
        QSX = fix(WPHI.T @ (SF0L / (hatSXL + eps) + SF0R / (hatSXR + eps)))
        HPHI = HPHI * PSX / (QSX + eps)
        norm = fix1(jnp.sum(HPHI, axis=0))
        HPHI = HPHI / (norm + eps)[None, :]
        HF0 = HF0 * norm[None, :]
        SPHI = WPHI @ HPHI
        SF0 = WF0 @ HF0
        SF0L, SF0R = alphaL**2 * SF0, alphaR**2 * SF0
        SVL, SVR = SPHI * SF0L, SPHI * SF0R
        hatSXL, hatSXR = fix(SVL + SML), fix(SVR + SMR)

        # HM
        WML = WM * betaL2[None, :]
        WMR = WM * betaR2[None, :]
        PSX = WML.T @ (SXL / (hatSXL**2 + eps)) + WMR.T @ (SXR / (hatSXR**2 + eps))
        QSX = fix(WML.T @ (1.0 / (hatSXL + eps)) + WMR.T @ (1.0 / (hatSXR + eps)))
        HM = HM * PSX / (QSX + eps)
        SML = WM @ (betaL2[:, None] * HM)
        SMR = WM @ (betaR2[:, None] * HM)
        hatSXL, hatSXR = fix(SVL + SML), fix(SVR + SMR)

        # HGAMMA
        PSX = WGAMMA.T @ (
            SF0L * SXL / (hatSXL**2 + eps) + SF0R * SXR / (hatSXR**2 + eps)
        ) @ HPHI.T
        QSX = WGAMMA.T @ (
            SF0L / (hatSXL + eps) + SF0R / (hatSXR + eps)
        ) @ HPHI.T
        HGAMMA = HGAMMA * PSX / (QSX + eps)
        norm = jnp.sum(HGAMMA, axis=0)
        HGAMMA = HGAMMA / (norm + eps)[None, :]
        HPHI = HPHI * norm[:, None]
        norm = fix1(jnp.sum(HPHI, axis=0))
        HPHI = HPHI / (norm + eps)[None, :]
        HF0 = HF0 * norm[None, :]
        WPHI = WGAMMA @ HGAMMA
        SPHI = WPHI @ HPHI
        SF0 = WF0 @ HF0
        SV = SPHI * SF0
        SVL, SVR = alphaL**2 * SV, alphaR**2 * SV
        hatSXL, hatSXR = fix(SVL + SML), fix(SVR + SMR)

        # WM
        HML = betaL2[:, None] * HM
        HMR = betaR2[:, None] * HM
        PSX = (SXL / (hatSXL**2 + eps)) @ HML.T + (SXR / (hatSXR**2 + eps)) @ HMR.T
        QSX = (1.0 / (hatSXL + eps)) @ HML.T + (1.0 / (hatSXR + eps)) @ HMR.T
        WM = WM * PSX / (QSX + eps)
        norm = jnp.sum(WM, axis=0)
        WM = WM / (norm + eps)[None, :]
        HM = HM * norm[:, None]
        SML = (WM * betaL2[None, :]) @ HM
        SMR = (WM * betaR2[None, :]) @ HM
        hatSXL, hatSXR = fix(SVL + SML), fix(SVR + SMR)

        # alpha (damped multiplicative update, exponent 0.1)
        PL = jnp.sum(SV * SXL / (hatSXL**2 + eps))
        QL = jnp.sum(SV / (hatSXL + eps))
        alphaL = alphaL * (PL / (QL + eps)) ** 0.1
        PR = jnp.sum(SV * SXR / (hatSXR**2 + eps))
        QR = jnp.sum(SV / (hatSXR + eps))
        alphaR = alphaR * (PR / (QR + eps)) ** 0.1
        alphaL, alphaR = alphaL + eps, alphaR + eps
        alphaL = alphaL / (alphaL + alphaR)
        alphaR = 1.0 - alphaL
        hatSXL = fix(alphaL**2 * SV + SML)
        hatSXR = fix(alphaR**2 * SV + SMR)

        # beta
        PL = jnp.sum((WM.T @ (SXL / (hatSXL**2 + eps))) * HM, axis=1)
        QL = jnp.sum((WM.T @ (1.0 / (hatSXL + eps))) * HM, axis=1)
        betaL = betaL * (PL / (QL + eps)) ** 0.1
        PR = jnp.sum((WM.T @ (SXR / (hatSXR**2 + eps))) * HM, axis=1)
        QR = jnp.sum((WM.T @ (1.0 / (hatSXR + eps))) * HM, axis=1)
        betaR = betaR * (PR / (QR + eps)) ** 0.1
        betaL, betaR = betaL + eps, betaR + eps
        betaL = betaL / (betaL + betaR)
        betaR = 1.0 - betaL
        betaL2, betaR2 = betaL**2, betaR**2

        SPHIL, SPHIR = alphaL**2 * SPHI, alphaR**2 * SPHI
        SVL, SVR = SPHIL * SF0, SPHIR * SF0
        SML = (WM * betaL2[None, :]) @ HM
        SMR = (WM * betaR2[None, :]) @ HM
        hatSXL, hatSXR = fix(SVL + SML), fix(SVR + SMR)

        err = 0.5 * (
            self._is_divergence(SXL, hatSXL, n_real)
            + self._is_divergence(SXR, hatSXR, n_real)
        )
        state = (HGAMMA, HPHI, HF0, WM, HM, alphaL, alphaR, betaL, betaR)
        aux = (SVL, SVR, SML, SMR, hatSXL, hatSXR)
        return state, aux, err

    def fit_stereo(self, SXL, SXR, sHF0, seed: int = 0) -> dict:
        """Second (stereo) pass with the melody-constrained sHF0 init:
        power spectrograms SXL/SXR [N, F] -> separation factors with
        per-channel gains (imm/tf_imm.py:354-618)."""
        cfg = self.config
        SXL = jnp.asarray(SXL, jnp.float32).T
        SXR = jnp.asarray(SXR, jnp.float32).T
        N = SXL.shape[1]
        N_pad = self._frame_bucket(N)
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 5)
        state = (
            jnp.abs(jax.random.normal(ks[0], (cfg.P, cfg.K))),
            self._pad_frames(jnp.abs(jax.random.normal(ks[1], (cfg.K, N))), N_pad),
            self._pad_frames(jnp.asarray(sHF0, jnp.float32), N_pad),
            jnp.abs(jax.random.normal(ks[2], (cfg.F, cfg.R))),
            self._pad_frames(jnp.abs(jax.random.normal(ks[3], (cfg.R, N))), N_pad),
            jnp.float32(0.5),
            jnp.float32(0.5),
            jax.random.uniform(ks[4], (cfg.R,)),
            jnp.float32(1.0) - jax.random.uniform(ks[4], (cfg.R,)),
        )
        (HGAMMA, HPHI, HF0, WM, HM, aL, aR, bL, bR), aux, err, _ = (
            self._stereo_fit_fn(
                self._pad_frames(SXL, N_pad), self._pad_frames(SXR, N_pad),
                jnp.int32(N), *state,
            )
        )
        SVL, SVR, SML, SMR, hatSXL, hatSXR = aux
        cut = lambda M: M[:, :N]  # noqa: E731 — drop padded frame columns
        return dict(
            HGAMMA=HGAMMA, HPHI=cut(HPHI), HF0=cut(HF0), WM=WM, HM=cut(HM),
            alphaL=aL, alphaR=aR, betaL=bL, betaR=bR,
            SVL=cut(SVL), SVR=cut(SVR), SML=cut(SML), SMR=cut(SMR),
            hatSXL=cut(hatSXL), hatSXR=cut(hatSXR), err=float(err),
        )

    def _stereo_aux_from_state(
        self, HGAMMA, HPHI, HF0, WM, HM, alphaL, alphaR, betaL, betaR
    ):
        """The stereo aux spectra as pure functions of the factors — the
        same expressions the _stereo_iteration tail assembles (asserted
        equal in tests)."""
        WGAMMA = jnp.asarray(self.WGAMMA)
        WF0 = jnp.asarray(self.WF0)
        WPHI = WGAMMA @ HGAMMA
        SPHI = WPHI @ HPHI
        SF0 = WF0 @ HF0
        betaL2, betaR2 = betaL**2, betaR**2
        SVL = (alphaL**2 * SPHI) * SF0
        SVR = (alphaR**2 * SPHI) * SF0
        SML = (WM * betaL2[None, :]) @ HM
        SMR = (WM * betaR2[None, :]) @ HM
        return SVL, SVR, SML, SMR, SVL + SML, SVR + SMR

    def _stereo_fit_loop(self, SXL, SXR, n_real, *state0):
        def iterate(state):
            new_state, _, err = self._stereo_iteration(
                SXL, SXR, *state, n_real=n_real
            )
            return new_state, err

        best_state, best_err, it = self._keep_best_while(iterate, tuple(state0))
        return best_state, self._stereo_aux_from_state(*best_state), best_err, it

    def separate_stereo(self, XL, XR, stereo_result: dict):
        """Wiener-mask separation + ISTFT resynthesis: complex spectra
        XL/XR [N, F] -> dict(melody=(yL, yR), accompaniment=(yL, yR))."""
        eps = self.config.eps

        def mask_istft(X, S, hatS):
            mask = np.asarray((S + eps) / (hatS + eps)).T  # [N, F]
            return np.asarray(self.stft.istft(np.asarray(X) * mask))

        return dict(
            melody=(
                mask_istft(XL, stereo_result["SVL"], stereo_result["hatSXL"]),
                mask_istft(XR, stereo_result["SVR"], stereo_result["hatSXR"]),
            ),
            accompaniment=(
                mask_istft(XL, stereo_result["SML"], stereo_result["hatSXL"]),
                mask_istft(XR, stereo_result["SMR"], stereo_result["hatSXR"]),
            ),
        )

    def constrained_HF0(self, HF0: np.ndarray, melody_states: np.ndarray) -> np.ndarray:
        """Melody-constrained sHF0: keep only bins within half a semitone of
        the decoded state per voiced frame (imm/tf_imm.py:720-739)."""
        cfg = self.config
        U = cfg.U
        HF0 = np.asarray(HF0)
        states = np.asarray(melody_states)
        voiced = states < U
        offset = cfg.bins_per_note // 2
        start = np.maximum(states - offset, 0)
        end = np.minimum(states + offset + 1, U)
        bins = np.arange(U)[:, None]
        mask = (bins >= start[None, :]) & (bins < end[None, :]) & voiced[None, :]
        return np.where(mask, HF0, 0.0).astype(np.float32)

    def energies_for_f0s(self, result: dict, SX) -> np.ndarray:
        """Per-f0-bin Wiener energies [U, N] — vectorized to two matmuls:
        E[u,n] = HF0[u,n]^2 * sum_f WF0[f,u]^2 * (SPHI[f,n]/hatSX[f,n])^2 * SX[f,n]."""
        cfg = self.config
        SX = jnp.asarray(SX, jnp.float32).T  # [F, N]
        G = (result["SPHI"] / (result["hatSX"] + cfg.eps)) ** 2 * SX  # [F, N]
        WF0sq = jnp.asarray(self.WF0) ** 2  # [F, U]
        E = (WF0sq.T @ G) * result["HF0"] ** 2
        return np.asarray(E, np.float32)

    def logits_from_fit(self, result: dict, SX) -> np.ndarray:
        """Fit + power spectrogram -> log10 Wiener energies + 6, [U, N]
        (the tail of imm/tf_imm.py:659-678). Shared by `logits` and any
        caller that keeps the fit around (e.g. the 'original' evaluation)."""
        energies = self.energies_for_f0s(result, SX)
        hw = (self.config.w // 2) ** 2
        energies = np.maximum(energies / float(hw), 1e-11)
        return (np.log10(energies) + 6.0).astype(np.float32)

    def logits(self, samples: np.ndarray, seed: int = 0) -> np.ndarray:
        """Full per-track chain: samples -> log10 Wiener energies + 6,
        [U, N] (imm/tf_imm.py:659-678)."""
        SX = np.asarray(jnp.abs(self.stft.stft(samples))) ** 2
        result = self.fit(SX, seed=seed)
        return self.logits_from_fit(result, SX)

    def process_HF0(self, HF0: np.ndarray) -> np.ndarray:
        """HF0 -> log observations for the "original" decode: floor at the
        smallest positive value (min exp(-87)), log, pad an unvoiced row at
        the running minimum (imm/tf_imm.py:71-88)."""
        HF0 = np.asarray(HF0)
        t = HF0[HF0 > 0].min()
        if np.log(t) < -87:
            t = np.exp(-87)
        logH = np.log(HF0 + t)
        return np.pad(
            logH, [(0, 1), (0, 0)], mode="constant", constant_values=logH.min()
        )

    def voicing_detection(self, SX, result: dict, melody_states: np.ndarray) -> np.ndarray:
        """Melody-band Wiener energy voicing with the cumulative-energy
        threshold 5.84e-4 (imm/tf_imm.py:705-756)."""
        cfg = self.config
        U = cfg.U
        HF0 = np.asarray(result["HF0"])
        N = HF0.shape[1]
        states = np.asarray(melody_states)
        voiced = states < U
        offset = cfg.bins_per_note // 2
        start = np.maximum(states - offset, 0)
        end = np.minimum(states + offset + 1, U)

        bins = np.arange(U)[:, None]
        mask = (bins >= start[None, :]) & (bins < end[None, :]) & voiced[None, :]
        sHF0 = np.where(mask, HF0, 0.0).astype(np.float32)

        SF0 = jnp.asarray(self.WF0) @ jnp.asarray(sHF0)
        SV = result["SPHI"] * SF0
        hatSX = SV + result["SM"]
        ratio = (SV + cfg.eps) / (hatSX + cfg.eps)
        frame_energies = np.asarray(
            jnp.sum(ratio**2 * jnp.asarray(SX, jnp.float32).T, axis=0)
        )
        es = np.sort(frame_energies)
        c = np.cumsum(es)
        c = c / c[-1]
        idx = int(np.argmax(c > 5.84e-4))
        return frame_energies > es[idx]

    def melody_f0s(self, melody_states: np.ndarray, voicing: np.ndarray) -> np.ndarray:
        states = np.minimum(np.asarray(melody_states), self.config.U - 1)
        return np.where(voicing, self.f0s[states], 0.0)
