"""Observation models vs straightforward per-frame NumPy oracles.

The oracles below re-derive the reference's per-frame loop semantics
(dcnet/softmax_viterbi.py:2316-2360 and :2530-2579) independently; the
vectorized jnp implementations must agree to float tolerance, and the peak
masks must agree exactly.
"""

import numpy as np
import pytest
from scipy.special import expit

from viterbi_spl_tpu.hmm.obs import (
    find_peaks,
    rereference_softmax_logits,
    shaun_observation_probs,
    softmax_observation_probs,
)


def oracle_find_peaks(logits, spw):
    T, n_bins = logits.shape
    padded = np.pad(logits, [(0, 0), (spw, spw)], mode="reflect")
    w = 2 * spw + 1
    out = np.zeros((T, n_bins), bool)
    for b in range(n_bins):
        out[:, b] = np.argmax(padded[:, b : b + w], axis=1) == spw
    return out


def oracle_shaun(logits, threshold, spw, p=0.8, scale=2.0):
    T, n_bins = logits.shape
    offset = np.log(p / (1.0 - p))
    out = np.zeros((T, n_bins + 1), np.float32)
    peaks = oracle_find_peaks(logits, spw)
    for t in range(T):
        idx = np.where(peaks[t])[0]
        if len(idx) == 0:
            out[t, -1] = 1.0
            continue
        pl = logits[t, idx].astype(np.float64)
        g = pl.max()
        s = scale * (g - threshold) + (offset if g >= threshold else -offset)
        p_voiced = expit(s)
        e = np.exp(pl - g)
        out[t, idx] = e * (p_voiced / e.sum())
        out[t, -1] = 1.0 - p_voiced
    return out


def oracle_softmax(logits, vth_logit, init_probs, spw, scaled):
    """init_probs has unvoiced LAST (our convention)."""
    T, n_bins = logits.shape
    priors = np.asarray(init_probs, np.float64) if scaled else np.ones(n_bins + 1)
    out = np.zeros((T, n_bins + 1), np.float64)
    peaks = oracle_find_peaks(logits, spw)
    for t in range(T):
        idx = np.where(peaks[t])[0]
        if len(idx) == 0:
            out[t, -1] = 1.0 / priors[-1]
            continue
        vals = np.concatenate([[vth_logit], logits[t, idx]])
        g = vals.max()
        e = np.exp(vals - g)
        sm = e / e.sum()
        out[t, -1] = sm[0] / priors[-1]
        out[t, idx] = sm[1:] / priors[idx]
    return out


@pytest.mark.parametrize("spw,n_bins", [(5, 320), (16, 721), (20, 721)])
def test_find_peaks_matches_oracle(rng, spw, n_bins):
    logits = rng.normal(size=(40, n_bins)).astype(np.float32)
    expected = oracle_find_peaks(logits, spw)
    got = np.asarray(find_peaks(logits, spw))
    np.testing.assert_array_equal(expected, got)


def test_find_peaks_quantized_ties(rng):
    """Coarsely quantized logits produce many windowed ties; the shifted-max
    formulation must still match the windowed-argmax oracle exactly."""
    logits = rng.integers(0, 3, (60, 97)).astype(np.float32)
    for spw in (1, 3, 5):
        np.testing.assert_array_equal(
            oracle_find_peaks(logits, spw), np.asarray(find_peaks(logits, spw))
        )


def test_find_peaks_plateau_first_max():
    """On plateaus the FIRST max within the window wins (np.argmax semantics)."""
    logits = np.zeros((1, 20), np.float32)
    logits[0, 7] = 1.0
    logits[0, 8] = 1.0  # tie: only bin 7 can be a peak
    got = np.asarray(find_peaks(logits, 2))[0]
    assert got[7] and not got[8]


@pytest.mark.parametrize("spw,n_bins,th", [(5, 320, 0.31), (16, 721, -0.5), (20, 721, 2.442347)])
def test_shaun_obs_matches_oracle(rng, spw, n_bins, th):
    logits = rng.normal(size=(30, n_bins)).astype(np.float32) * 3
    threshold = np.log(th / (1 - th)) if 0 < th < 1 else th
    expected = oracle_shaun(logits, threshold, spw)
    got = np.asarray(shaun_observation_probs(logits, threshold, spw))
    assert got.shape == (30, n_bins + 1)
    np.testing.assert_allclose(expected, got, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-5)


def test_shaun_obs_no_peak_frame():
    """A frame whose window maxima all tie earlier can have no peaks -> unvoiced."""
    logits = np.zeros((2, 50), np.float32)  # all-zero frame: bin 0 is a peak
    got = np.asarray(shaun_observation_probs(logits, 0.5, 3))
    np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-6)


@pytest.mark.parametrize("scaled", [False, True])
def test_softmax_obs_matches_oracle(rng, scaled):
    n_bins, T, spw = 320, 25, 5
    logits = rng.normal(size=(T, n_bins)).astype(np.float32) * 2
    pi = rng.random(n_bins + 1) + 0.5
    pi = (pi / pi.sum()).astype(np.float32)
    vth = np.float32(np.log(0.54 / 0.46))
    expected = oracle_softmax(logits, vth, pi, spw, scaled)
    got = np.asarray(softmax_observation_probs(logits, vth, pi, spw, scaled))
    np.testing.assert_allclose(expected, got, rtol=2e-4, atol=1e-7)


def test_rereference_softmax_logits(rng):
    logits = rng.normal(size=(10, 322)).astype(np.float32)
    out = np.asarray(rereference_softmax_logits(logits))
    np.testing.assert_allclose(out, logits[:, 1:] - logits[:, :1], rtol=1e-6)


def test_shaun_obs_then_decode_matches_full_numpy_path(rng):
    """End-to-end: logits -> obs -> decode, jax vs numpy oracle chain."""
    from viterbi_spl_tpu.hmm.oracle import viterbi_oracle
    from viterbi_spl_tpu.hmm.viterbi import viterbi_decode_jax
    from viterbi_spl_tpu.hmm import params as P

    n_bins, T = 60, 80
    logits = rng.normal(size=(T, n_bins)).astype(np.float32)
    obs = np.asarray(shaun_observation_probs(logits, 0.2, 3)).T  # [S, T]
    # a simple valid HMM
    tracks = [np.concatenate([rng.integers(0, n_bins, 50), [n_bins] * 10])]
    stats = P.count_statistics(tracks, n_bins)
    A = P.shape_transition_matrix(
        stats.transition_counts, np.array([[0.95, 0.05], [0.1, 0.9]]), n_bins, 5, 2
    )
    pi = P.shape_init_probs(stats.p_steady)
    expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
    got = viterbi_decode_jax(transition_matrix=A, prob_init=pi, probs_st=obs)
    np.testing.assert_array_equal(expected, got)
