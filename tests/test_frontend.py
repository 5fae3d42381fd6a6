"""Front-end tests: STFT building blocks, sinebell round trip, jdc
spectrogram, and the CFP chain against an independent NumPy oracle."""

import numpy as np
import pytest

from viterbi_spl_tpu.frontend import (
    CFP,
    FTANET_CFP,
    MSNET_CFP,
    TONET_CFP,
    SinebellSTFT,
    jdc_spectrogram,
)
from viterbi_spl_tpu.frontend.stft import (
    frame_signal,
    stft_frames,
    unit_norm_blackmanharris,
)


def synth_audio(rng, n, sr, freqs=(220.0, 440.0, 660.0)):
    t = np.arange(n) / sr
    y = sum(a * np.sin(2 * np.pi * f * t) for a, f in zip((0.5, 0.3, 0.2), freqs))
    return (y + 0.01 * rng.normal(size=n)).astype(np.float32)


def test_frame_signal():
    import jax.numpy as jnp

    x = jnp.arange(10.0)
    f = np.asarray(frame_signal(x, 4, 2))
    assert f.shape == (4, 4)
    np.testing.assert_array_equal(f[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(f[1], [2, 3, 4, 5])


def test_stft_matches_numpy(rng):
    import jax.numpy as jnp

    sr, n = 8000, 4000
    y = synth_audio(rng, n, sr)
    win = unit_norm_blackmanharris(768)
    S = np.asarray(stft_frames(jnp.asarray(y), jnp.asarray(win), 4000, 80))
    # NumPy oracle
    n_frames = (n - 768) // 80 + 1
    expected = np.stack(
        [np.fft.rfft(y[i * 80 : i * 80 + 768] * win, n=4000) for i in range(n_frames)]
    )
    assert S.shape == expected.shape
    np.testing.assert_allclose(S, expected, rtol=1e-3, atol=1e-4)


def test_sinebell_roundtrip(rng):
    """Forward + inverse must reconstruct the signal (imm/tf_stft_istft.py:94-110)."""
    stft = SinebellSTFT(w=2048, h=256)
    y = synth_audio(rng, 44100, 44100)
    spec = stft.stft(y)
    assert spec.shape == (stft.num_frames(len(y)), 1025)
    y2 = np.asarray(stft.istft(spec))[: len(y)]
    err = np.abs(y2 - y)[2048:-2048]  # interior (edges touched by padding)
    snr = 10 * np.log10(np.mean(y**2) / max(np.mean(err**2), 1e-20))
    assert snr > 60, f"reconstruction SNR too low: {snr:.1f} dB"


def test_jdc_spectrogram_shape_and_range(rng):
    y = synth_audio(rng, 8000, 8000)
    spec = jdc_spectrogram(y)
    assert spec.shape == (101, 513)  # 1 + n//hop centered frames
    assert spec.dtype == np.float32
    assert spec.max() <= 1.0 + 1e-6
    assert spec.min() >= 0.0 - 1e-6  # top_db=80 -> floor at 0 after /80+1
    assert spec.max() == pytest.approx(1.0)


def test_cfp_config_bins():
    assert MSNET_CFP.n_bins == 320 and len(MSNET_CFP.central_freqs) == 321
    assert FTANET_CFP.n_bins == 320
    assert TONET_CFP.n_bins == 360 and len(TONET_CFP.central_freqs) == 361
    assert MSNET_CFP.fft_len == 22050
    assert FTANET_CFP.fft_len == 4000
    assert MSNET_CFP.max_num_frames == 45 * 44100 // 256


def _cfp_oracle_block(samples, cfg, window, Wf, Wq):
    """Independent per-step NumPy implementation of the CFP filterbank chain
    (semantics of msnet/tf_cfp.py:239-324)."""
    N = cfg.fft_len
    hNp1 = N // 2 + 1
    g0, g1, g2 = cfg.gammas
    hop = cfg.hop_size
    n_frames = (len(samples) - cfg.win_len) // hop + 1
    frames = np.stack(
        [samples[i * hop : i * hop + cfg.win_len] * window for i in range(n_frames)]
    )
    spec = np.abs(np.fft.rfft(frames, n=N, axis=-1)) ** g0

    ceps = np.fft.irfft(spec.astype(np.complex128), n=N, axis=-1)[:, :hNp1]
    ceps *= np.sqrt(N)
    cutoff = int(cfg.sr / cfg.fmax)
    ceps[:, : cutoff + 1] = 0
    ceps = np.maximum(ceps, 0) ** g1

    padded = np.pad(ceps, [(0, 0), (0, N // 2 - 1)], mode="reflect")
    gcos = np.real(np.fft.rfft(padded, axis=-1)) / np.sqrt(N)
    cutoff_f = int(cfg.fmin / cfg.fr)
    gcos = gcos[:, : hNp1 - 1]
    gcos[:, : cutoff_f + 1] = 0
    gcos = np.maximum(gcos, 0)
    if g2 != 1.0:
        gcos = gcos**g2

    spec, ceps = spec[:, :-1], ceps[:, :-1]
    high_f = int(cfg.fmax / cfg.fr)
    high_q = int(cfg.sr / cfg.fmin)
    return (
        spec[:, : high_f + 1] @ Wf,
        ceps[:, : high_q + 1] @ Wq,
        gcos[:, : high_f + 1] @ Wf,
    )


def test_cfp_block_matches_oracle(rng):
    import jax.numpy as jnp

    cfg = FTANET_CFP  # small sr keeps the oracle fast
    cfp = CFP(cfg)
    y = synth_audio(rng, 8000 * 2, 8000)
    half = cfg.win_len // 2
    padded = np.pad(y, (half, half - 1), mode="reflect")
    n_frames = (len(y) + cfg.hop_size - 1) // cfg.hop_size
    block = padded[: (n_frames - 1) * cfg.hop_size + cfg.win_len]

    got = [np.asarray(v) for v in cfp._block_fn(jnp.asarray(block))]
    exp = _cfp_oracle_block(
        block.astype(np.float64), cfg, cfp.window.astype(np.float64),
        cfp.freq_matrix.astype(np.float64), cfp.quef_matrix.astype(np.float64),
    )
    for g, e, name in zip(got, exp, ("spec", "ceps", "gcos")):
        assert g.shape == e.shape == (n_frames, cfg.n_bins)
        scale = max(np.abs(e).max(), 1e-9)
        np.testing.assert_allclose(
            g / scale, e / scale, atol=2e-3, err_msg=f"CFP {name} mismatch"
        )


def test_cfp_features_end_to_end(rng):
    cfg = FTANET_CFP
    cfp = CFP(cfg)
    y = synth_audio(rng, 8000 * 3, 8000)
    feat = cfp.features(y)
    n_frames = (len(y) + cfg.hop_size - 1) // cfg.hop_size
    assert feat.shape == (n_frames, 320, 3)
    assert feat.dtype == np.float32
    assert 0.0 <= feat.min() and feat.max() <= 1.0
    assert feat.max() == pytest.approx(1.0)
    # harmonic content should put salience in band
    assert feat[:, :, 0].mean() > 0.01


def test_cfp_blocking_is_seamless(rng):
    """Blocked processing (45 s) must equal single-block output — the
    reference's overlap scheme recomputes windows exactly."""
    cfg = FTANET_CFP
    import dataclasses

    small = dataclasses.replace(cfg, max_block_seconds=1)
    y = synth_audio(rng, 8000 * 3, 8000)
    f_small = CFP(small).features(y)
    f_big = CFP(cfg).features(y)
    np.testing.assert_allclose(f_small, f_big, atol=1e-5)


def test_cfp_tonet_layout(rng):
    cfp = CFP(TONET_CFP)
    y = synth_audio(rng, 8000, 8000)
    feat = cfp.features_tonet(y)
    assert feat.shape[0] == 3 and feat.shape[1] == 360
