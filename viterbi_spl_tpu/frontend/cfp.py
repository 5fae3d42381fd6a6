"""Combined Frequency & Periodicity (CFP) front-end, TPU-native.

Re-design of the reference's tf_cfp.py (one implementation, three configs:
msnet/tf_cfp.py, ftanet/tf_cfp.py:42-57, tonet/tf_cfp.py:60-63):

  STFT (unit-norm blackman-harris, zero-padded FFT) -> power-law compression
  -> generalized cepstrum (irFFT, high-pass lifter, relu, power) ->
  generalized cepstrum of spectrum (rFFT of reflect-padded cepstrum,
  high-pass, relu, power) -> triangular log-frequency filterbanks (freq->
  log-freq for spec/gcos, quefrency->log-freq for ceps) -> per-feature
  log1p + global min-max normalization -> [T, n_bins, 3] feature stack.

Long audio runs through 45 s blocks with window-length overlap
(msnet/tf_cfp.py:89-100, 339-402) — the jnp core is jit-compiled per block
shape; all heavy lifting (FFTs + filterbank matmuls) fuses in XLA and the
filterbank contractions hit the MXU.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .stft import stft_frames, unit_norm_blackmanharris


@dataclasses.dataclass(frozen=True)
class CFPConfig:
    sr: int
    win_len: int
    hop_size: int
    fmin: float
    fmax: float
    bins_per_oct: int = 60
    gammas: tuple[float, float, float] = (0.24, 0.6, 1.0)
    max_block_seconds: int = 45

    @property
    def fft_len(self) -> int:
        n = int(np.ceil(self.sr / 2.0))
        return n + 1 if n % 2 == 1 else n

    @property
    def fr(self) -> float:
        return float(self.sr) / self.fft_len

    @functools.cached_property
    def central_freqs(self) -> np.ndarray:
        fac = 2.0 ** (1.0 / self.bins_per_oct)
        freqs = []
        f = float(self.fmin)
        while f < self.fmax:
            freqs.append(f)
            f *= fac
        return np.asarray(freqs)

    @property
    def n_bins(self) -> int:
        return len(self.central_freqs) - 1

    @property
    def max_num_frames(self) -> int:
        return self.max_block_seconds * self.sr // self.hop_size


MSNET_CFP = CFPConfig(sr=44100, win_len=2048, hop_size=256, fmin=31, fmax=1250)
FTANET_CFP = CFPConfig(sr=8000, win_len=768, hop_size=80, fmin=31, fmax=1250)
TONET_CFP = CFPConfig(sr=8000, win_len=768, hop_size=80, fmin=32, fmax=2050)


def _freq_to_logfreq_matrix(config: CFPConfig) -> np.ndarray:
    """[HighFreqIdx+1, n_bins]: linear-frequency bins (k * fr) onto triangular
    log-frequency filters (msnet/tf_cfp.py:142-191)."""
    high = int(config.fmax / config.fr)
    grid = np.arange(high + 1) * config.fr
    centers = config.central_freqs
    n_filters = len(centers) - 1
    W = np.zeros((n_filters, high + 1), np.float64)
    for k in range(1, n_filters):
        lo, c, hi = centers[k - 1], centers[k], centers[k + 1]
        l = int(np.ceil(lo / config.fr))
        r = int(hi / config.fr)
        if l >= r:
            if l <= high:
                W[k, l] = 1.0
            continue
        for j in range(l, r + 1):
            g = grid[j]
            W[k, j] = (g - lo) / (c - lo) if g <= c else (hi - g) / (hi - c)
    return W.astype(np.float32).T


def _quef_to_logfreq_matrix(config: CFPConfig) -> np.ndarray:
    """[HighQuefIdx+1, n_bins]: quefrency bins (freq = sr / q) onto the same
    triangular log-frequency filters (msnet/tf_cfp.py:193-237)."""
    fs = float(config.sr)
    high = int(fs / config.fmin)
    centers = config.central_freqs
    n_filters = len(centers) - 1
    W = np.zeros((n_filters, high + 1), np.float64)
    for k in range(1, n_filters):
        lo, c, hi = centers[k - 1], centers[k], centers[k + 1]
        ql = int(np.ceil(fs / hi))
        qr = int(fs / lo)
        for q in range(ql, qr + 1):
            g = fs / q
            W[k, q] = (g - lo) / (c - lo) if g <= c else (hi - g) / (hi - c)
    return W.astype(np.float32).T


class CFP:
    """Callable CFP front-end. `features(samples)` -> [T, n_bins, 3]."""

    def __init__(self, config: CFPConfig = MSNET_CFP):
        self.config = config
        self.window = unit_norm_blackmanharris(config.win_len)
        self.freq_matrix = _freq_to_logfreq_matrix(config)
        self.quef_matrix = _quef_to_logfreq_matrix(config)
        self._block_fn = jax.jit(self._filterbank_block)

    def _filterbank_block(self, samples: jnp.ndarray):
        """One block of samples -> (spec, ceps, gcos) [n_frames, n_bins].
        Mirrors msnet/tf_cfp.py:239-324 step for step."""
        cfg = self.config
        g0, g1, g2 = cfg.gammas
        N = cfg.fft_len
        hNp1 = N // 2 + 1
        fr, fs = cfg.fr, float(cfg.sr)

        spec = jnp.abs(
            stft_frames(samples, jnp.asarray(self.window), N, cfg.hop_size)
        ) ** jnp.float32(g0)  # [T, hNp1]
        n_frames = spec.shape[0]

        # generalized cepstrum
        ceps = jnp.fft.irfft(spec.astype(jnp.complex64), n=N, axis=-1)
        ceps = ceps[:, :hNp1] * jnp.float32(np.sqrt(N))
        cutoff_q = int(fs / cfg.fmax)  # inclusive high-pass lifter
        ceps = ceps.at[:, : cutoff_q + 1].set(0.0)
        ceps = jnp.maximum(ceps, 0.0) ** jnp.float32(g1)

        # generalized cepstrum of spectrum
        padded = jnp.pad(ceps, ((0, 0), (0, N // 2 - 1)), mode="reflect")
        gcos = jnp.real(jnp.fft.rfft(padded, axis=-1)) * jnp.float32(1.0 / np.sqrt(N))
        cutoff_f = int(cfg.fmin / fr)
        gcos = gcos[:, : hNp1 - 1]  # drop Nyquist (reference slices :-1)
        gcos = gcos.at[:, : cutoff_f + 1].set(0.0)
        gcos = jnp.maximum(gcos, 0.0)
        if g2 != 1.0:
            gcos = gcos ** jnp.float32(g2)

        spec = spec[:, :-1]
        ceps = ceps[:, :-1]

        high_f = int(cfg.fmax / fr)
        high_q = int(fs / cfg.fmin)
        spec = spec[:, : high_f + 1]
        gcos = gcos[:, : high_f + 1]
        ceps = ceps[:, : high_q + 1]

        Wf = jnp.asarray(self.freq_matrix)
        Wq = jnp.asarray(self.quef_matrix)
        spec = jnp.dot(spec, Wf, preferred_element_type=jnp.float32)
        gcos = jnp.dot(gcos, Wf, preferred_element_type=jnp.float32)
        ceps = jnp.dot(ceps, Wq, preferred_element_type=jnp.float32)
        return spec, ceps, gcos

    @staticmethod
    def _normalize(x: np.ndarray) -> np.ndarray:
        """log1p + global min-max (msnet/tf_cfp.py:326-337); left unscaled
        when max ~= min."""
        x = np.log1p(x)
        lo, hi = x.min(), x.max()
        if hi > lo + 1e-3:
            x = (x - lo) / (hi - lo)
        return x

    def features(self, samples: np.ndarray) -> np.ndarray:
        """Whole-track CFP features [total_num_frames, n_bins, 3].

        Reflect-pads half a window each side, splits into 45 s frame blocks
        with window-length overlap, runs the jit block core, then applies the
        per-feature whole-track normalization. (msnet/tf_cfp.py:339-402.)
        """
        cfg = self.config
        samples = np.asarray(samples, np.float32)
        half = cfg.win_len // 2
        total_frames = (len(samples) + cfg.hop_size - 1) // cfg.hop_size
        padded = np.pad(samples, (half, half - 1), mode="reflect")
        needed = (total_frames - 1) * cfg.hop_size + cfg.win_len
        if needed > len(padded):
            raise ValueError("padding shortfall")
        padded = padded[:needed]

        starts = list(range(0, total_frames, cfg.max_num_frames)) + [total_frames]
        outs = {0: [], 1: [], 2: []}
        for s, e in zip(starts[:-1], starts[1:]):
            s0 = s * cfg.hop_size
            e0 = (e - s - 1) * cfg.hop_size + s0 + cfg.win_len
            block = jnp.asarray(padded[s0:e0])
            for i, part in enumerate(self._block_fn(block)):
                part = np.asarray(part)
                if part.shape != (e - s, cfg.n_bins):
                    raise AssertionError(f"block shape {part.shape}")
                outs[i].append(part)

        spec, ceps, gcos = (np.concatenate(outs[i], axis=0) for i in range(3))
        spec, ceps, gcos = map(self._normalize, (spec, ceps, gcos))
        feat = np.stack([spec, ceps, gcos], axis=-1).astype(np.float32)
        return np.require(feat, requirements=["C"])

    def features_tonet(self, samples: np.ndarray) -> np.ndarray:
        """TONet layout: [3, n_bins, T] (tonet/tf_cfp.py:400)."""
        return np.ascontiguousarray(self.features(samples).transpose(2, 1, 0))
