"""STFT front-ends in jnp: XLA-fused framing + rFFT.

Three variants the reference uses:
- generic framed STFT (building block for CFP; msnet/tf_cfp.py:102-140),
- the jdc log-magnitude spectrogram (librosa-style centered STFT +
  power_to_db(ref=max, top_db=80)/80 + 1; jdc/kum_m2m3.py:495-509),
- the IMM sinebell STFT/ISTFT pair with exact overlap-add inversion
  (imm/tf_stft_istft.py:8-91).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal.windows import blackmanharris, hann


def complex_to_host(x) -> np.ndarray:
    """Device complex array -> host numpy.

    The axon TPU tunnel cannot transfer complex dtypes between host and
    device (UNIMPLEMENTED); FFTs compute fine ON device, so complex values
    must cross the boundary as separate real/imag f32 planes.
    """
    if isinstance(x, np.ndarray):
        return x
    return np.asarray(jnp.real(x)) + 1j * np.asarray(jnp.imag(x))


def complex_to_device(x) -> jnp.ndarray:
    """Host complex array -> device, under the same tunnel constraint."""
    if not isinstance(x, np.ndarray) or not np.iscomplexobj(x):
        return jnp.asarray(x)
    xr = jnp.asarray(np.ascontiguousarray(x.real, dtype=np.float32))
    xi = jnp.asarray(np.ascontiguousarray(x.imag, dtype=np.float32))
    return jax.lax.complex(xr, xi)


def frame_signal(samples: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """[N] -> [n_frames, frame_length] with stride `hop` (no padding).

    n_frames = (N - frame_length) // hop + 1. Gather-free: reshaped strided
    slices keep XLA happy with static shapes.
    """
    n = samples.shape[0]
    n_frames = (n - frame_length) // hop + 1
    idx = jnp.arange(frame_length)[None, :] + hop * jnp.arange(n_frames)[:, None]
    return samples[idx]


@functools.partial(jax.jit, static_argnames=("fft_len", "hop"))
def stft_frames(samples, window, fft_len: int, hop: int):
    """Framed STFT: frames windowed by `window` (len = frame len), zero-padded
    rFFT to fft_len. Returns complex [n_frames, fft_len//2 + 1]."""
    frames = frame_signal(samples, window.shape[0], hop) * window[None, :]
    return jnp.fft.rfft(frames, n=fft_len, axis=-1)


def jdc_spectrogram(samples: np.ndarray, sr: int = 8000) -> np.ndarray:
    """The jdc input spectrogram (jdc/kum_m2m3.py:495-509).

    librosa-style: centered STFT (reflect pad n_fft//2), hann window,
    n_fft = win = 1024, hop 80; |S| through power_to_db(ref=max, top_db=80),
    scaled to /80 + 1. Returns [n_frames, 513] float32.
    """
    n_fft, hop = 1024, 80
    window = hann(n_fft, sym=False).astype(np.float32)
    y = np.pad(np.asarray(samples, np.float32), n_fft // 2, mode="reflect")
    # abs ON device: the axon tunnel cannot read back complex dtypes
    spec = np.asarray(jnp.abs(stft_frames(jnp.asarray(y), jnp.asarray(window), n_fft, hop)))

    # librosa.power_to_db(ref=np.max, amin=1e-10, top_db=80)
    amin = 1e-10
    ref = max(float(spec.max()), amin)
    db = 10.0 * np.log10(np.maximum(spec, amin)) - 10.0 * np.log10(ref)
    db = np.maximum(db, db.max() - 80.0)
    out = db / 80.0 + 1.0
    return np.require(out.astype(np.float32), requirements=["C"])


class SinebellSTFT:
    """The IMM sinebell STFT/ISTFT pair (imm/tf_stft_istft.py).

    Forward: reflect-pad w//2 left (plus right padding to a whole number of
    frames), sinebell window, rFFT. Inverse: irFFT, window again,
    overlap-add, drop the w//2 lead-in, scale by 1/overlap where
    overlap = sum(window^2)/w * (w/h). Exact round trip up to float error.
    """

    def __init__(self, w: int = 2048, h: int = 256):
        if w % h != 0:
            raise ValueError("window length must be a multiple of the hop")
        self.w, self.h = w, h
        window = np.sin(np.pi * np.arange(w) / w)
        self.overlap = float(np.sum(window**2) / w * (w // h))
        self.window = window.astype(np.float32)

    def stft(self, samples) -> jnp.ndarray:
        w, h = self.w, self.h
        y = jnp.asarray(samples, jnp.float32)
        n = y.shape[0]
        n_frames = -(-n // h)
        left = w // 2
        required = (n_frames - 1) * h + w
        right = required - (n + left)
        if right < 0:
            raise ValueError("unexpected padding")
        y = jnp.pad(y, (left, right), mode="reflect")
        return stft_frames(y, jnp.asarray(self.window), w, h)

    def istft(self, spec) -> jnp.ndarray:
        w, h = self.w, self.h
        frames = jnp.fft.irfft(complex_to_device(spec), n=w, axis=-1)
        frames = frames * jnp.asarray(self.window)[None, :]
        n_frames = frames.shape[0]
        n_samples = (n_frames - 1) * h + w
        # overlap-add via scatter into the output signal
        out = jnp.zeros((n_samples,), jnp.float32)
        idx = jnp.arange(w)[None, :] + h * jnp.arange(n_frames)[:, None]
        out = out.at[idx.reshape(-1)].add(frames.reshape(-1))
        return out[w // 2 :] / self.overlap

    def num_frames(self, n_samples: int) -> int:
        return -(-n_samples // self.h)


def unit_norm_blackmanharris(win_len: int) -> np.ndarray:
    """The CFP analysis window: periodic blackman-harris, unit L2 norm
    (msnet/tf_cfp.py:53-55)."""
    w = blackmanharris(win_len, sym=False).astype(np.float32)
    return w / np.linalg.norm(w)
