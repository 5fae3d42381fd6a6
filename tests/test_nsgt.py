"""NSGT tests: perfect reconstruction (the reference's own SNR check,
dcnet/nsgt.py:396-418), structural invariants, and blocked long-audio
consistency."""

import numpy as np
import pytest

from viterbi_spl_tpu.frontend.nsgt import NSGT, dcnet_feature, nsgt_for_length


@pytest.fixture(scope="module")
def nsgt16():
    return NSGT(2**16)


def synth(rng, n, sr=44100):
    t = np.arange(n) / sr
    y = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.3 * np.sin(2 * np.pi * 555 * t)
        + 0.05 * rng.normal(size=n)
    )
    return y.astype(np.float32)


def test_band_structure(nsgt16):
    # 60 bins/oct from ~32 Hz to 22.05 kHz -> 566 bands + DC + Nyquist
    assert nsgt16.Lfbas == 566
    assert nsgt16.n_out_bands == 568
    assert nsgt16.max_bw == 2**16 // 64
    assert nsgt16.uni_side_cyc_frames == int(2.88 / 14.0 * 44100 / 64)


def test_roundtrip_snr(rng, nsgt16):
    """Forward+inverse must reconstruct with high SNR."""
    y = synth(rng, nsgt16.Ls)
    coeffs = nsgt16.forward(y)
    assert coeffs.shape == (568, nsgt16.max_bw)
    y2 = np.asarray(nsgt16.inverse(coeffs))
    err = np.sum((y2 - y) ** 2)
    snr = 10 * np.log10(np.sum(y.astype(np.float64) ** 2) / max(err, 1e-30))
    assert snr > 50, f"NSGT reconstruction SNR {snr:.1f} dB"


def test_forward_linearity(rng, nsgt16):
    y1, y2 = synth(rng, nsgt16.Ls), synth(rng, nsgt16.Ls)
    c1 = np.asarray(nsgt16.forward(y1))
    c2 = np.asarray(nsgt16.forward(y2))
    c12 = np.asarray(nsgt16.forward(y1 + y2))
    np.testing.assert_allclose(c12, c1 + c2, atol=1e-3)


def test_tone_hits_expected_band(nsgt16):
    """A 440 Hz tone must peak in the band whose center is closest to 440."""
    sr = 44100
    t = np.arange(nsgt16.Ls) / sr
    y = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    mag = np.abs(np.asarray(nsgt16.forward(y)))
    band_energy = mag.sum(axis=1)
    peak_band = int(np.argmax(band_energy[1:-1])) + 1  # skip DC
    centers = nsgt16.fmin * nsgt16.factor ** np.arange(nsgt16.Lfbas)
    expected_band = 1 + int(np.argmin(np.abs(centers - 440.0)))
    assert abs(peak_band - expected_band) <= 1


def test_transform_track_blocking(rng, nsgt16):
    """Blocked transform output must match the per-frame content of a padded
    single-block transform on the shared interior frames."""
    n = int(2.2 * nsgt16.Ls)
    y = synth(rng, n)
    out = nsgt16.transform_track(y)
    frames = -(-((n + 63) // 64 * 64) // 64)
    assert out.shape == ((n + 63) // 64, 568)
    assert out.dtype == np.float32

    # seam consistency: re-run with different snippet alignment by prepending
    # exactly one payload of silence, then compare the overlapping frames
    pay = nsgt16.num_frames_per_Ls - 2 * nsgt16.uni_side_cyc_frames
    y2 = np.concatenate([np.zeros(pay * 64, np.float32), y])
    out2 = nsgt16.transform_track(y2)
    a = out[: len(out) - pay]
    b = out2[pay : pay + len(a)]
    scale = max(out.max(), 1e-9)
    mism = np.abs(a - b) / scale
    assert np.quantile(mism, 0.999) < 5e-3


def test_dcnet_feature_shape(rng, nsgt16):
    y = synth(rng, 2 * nsgt16.Ls + 321)
    mag = nsgt16.transform_track(y)
    feat = dcnet_feature(mag)
    assert feat.shape == (mag.shape[0] // 4 + (1 if mag.shape[0] % 4 else 0), 500)
    assert feat.max() == pytest.approx(1.0)
    assert feat.min() >= 0.0


def test_nsgt_for_length():
    ins = nsgt_for_length(int(2**18 * 1.5))
    assert ins.Ls == 2**18
