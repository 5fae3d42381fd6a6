"""HMM parameter estimation tests: counting, shaping, init probs, imm analytic."""

import numpy as np
import pytest

from viterbi_spl_tpu.hmm import params as P


def test_quantize_ref_notes_basic():
    # dcnet mapping: min_note 23.6, 5 bins/semitone, 320 bins
    notes = np.array([0.0, 23.6, 23.7, 87.4, 100.0])
    bins = P.quantize_ref_notes(notes, 23.6, 87.4, 5, 320)
    assert bins[0] == 320  # unvoiced
    assert bins[1] == 0
    assert bins[2] == 0 or bins[2] == 1  # round(0.5) banker's -> 0
    assert bins[3] == 319
    assert bins[4] == 319  # clamped to max_note first


def test_count_statistics_small():
    n_bins = 4
    track = np.array([0, 0, 1, 4, 4, 2], np.int64)  # 4 = unvoiced
    stats = P.count_statistics([track], n_bins)
    assert stats.steady_counts.tolist() == [2, 1, 1, 0, 2]
    assert stats.transition_counts[0, 0] == 1
    assert stats.transition_counts[0, 1] == 1
    assert stats.transition_counts[1, 4] == 1
    assert stats.transition_counts[4, 4] == 1
    assert stats.transition_counts[4, 2] == 1
    assert stats.transition_counts.sum() == 5
    # switch: pairs (v,v),(v,v),(v,u),(u,u),(u,v)
    assert stats.switch_counts.tolist() == [[2, 1], [1, 1]]
    assert np.isclose(stats.p_steady.sum(), 1.0)


def test_count_statistics_no_cross_track_pairs():
    n_bins = 3
    s1 = P.count_statistics([np.array([0, 1]), np.array([2, 3])], n_bins)
    assert s1.transition_counts[1, 2] == 0
    assert s1.transition_counts.sum() == 2


def test_shape_transition_matrix_structure():
    n_bins = 50
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 100, (n_bins + 1, n_bins + 1))
    switch = np.array([[0.98713454, 0.01286546], [0.01002112, 0.98997888]])
    d_max = 12
    A = P.shape_transition_matrix(counts, switch, n_bins, d_max, floor=6)
    assert A.shape == (n_bins + 1, n_bins + 1)
    np.testing.assert_allclose(A.sum(axis=1), 1.0, rtol=1e-6)
    # banded voiced block
    i, j = np.ogrid[:n_bins, :n_bins]
    out_of_band = np.abs(j - i) > d_max
    assert np.all(A[:n_bins, :n_bins][out_of_band] == 0)
    # Toeplitz within full-band rows: A[i, i+d] equal across central rows
    assert np.isclose(A[20, 22] * A[25, 25], A[25, 27] * A[20, 20], rtol=1e-5)
    # switch coupling
    np.testing.assert_allclose(A[:n_bins, n_bins], switch[0, 1], rtol=1e-6)
    np.testing.assert_allclose(A[n_bins, :n_bins], switch[1, 0] / n_bins, rtol=1e-6)
    assert np.isclose(A[n_bins, n_bins], switch[1, 1])


def test_shape_transition_floor_dominates_unseen():
    """Distances never observed still get the floor count."""
    n_bins = 30
    counts = np.zeros((n_bins + 1, n_bins + 1), np.int64)
    counts[:n_bins, :n_bins] = np.eye(n_bins, dtype=np.int64) * 1000
    switch = np.array([[0.9, 0.1], [0.2, 0.8]])
    A = P.shape_transition_matrix(counts, switch, n_bins, d_max=3, floor=2)
    assert A[10, 11] > 0  # floored distance is present
    assert A[10, 10] > A[10, 11]


def test_shape_init_probs():
    p = np.array([0.5, 0.0, 0.2, 0.3])  # last = unvoiced
    out = P.shape_init_probs(p, p_th=0.01)
    assert np.isclose(out.sum(), 1.0)
    assert out[-1] == np.float32(0.3)
    assert out[1] > 0  # floored
    assert out.dtype == np.float32


def test_shape_init_probs_default_threshold():
    rng = np.random.default_rng(1)
    p = rng.random(322)
    p /= p.sum()
    out = P.shape_init_probs(p)
    assert np.isclose(out.sum(), 1.0)
    assert np.all(out > 0)


def test_imm_transition_matrix():
    A = P.imm_transition_matrix(bins_per_semitone=20, n_bins=721)
    assert A.shape == (722, 722)
    np.testing.assert_allclose(A.sum(axis=1), 1.0, rtol=1e-10)
    # exp decay by semitone distance within cutoff
    assert A[0, 0] > A[0, 20] > A[0, 40]
    # flat beyond 10-semitone cutoff
    assert np.isclose(A[0, 250], A[0, 500])
    # vanishing voiced<->unvoiced couplings
    assert A[0, 721] < 1e-80
    assert A[721, 0] > A[0, 721]


def test_single_side_d_max():
    # ftanet formula at h=10 ms, 60 bins/oct
    assert P.single_side_d_max(0.01, 60) == int(35.92 * 0.01 * 60 * 1.3 // 2)
    # dcnet-era 256/44100 hop
    assert P.single_side_d_max(256 / 44100, 60) >= 1


def test_shaped_matrix_decodes(rng):
    """Shaped params drive a decode that prefers continuity."""
    from viterbi_spl_tpu.hmm.oracle import viterbi_oracle

    n_bins = 40
    tracks = [np.clip(20 + np.cumsum(rng.integers(-1, 2, 300)), 0, n_bins - 1)]
    stats = P.count_statistics(tracks, n_bins)
    A = P.shape_transition_matrix(
        stats.transition_counts, np.array([[0.97, 0.03], [0.05, 0.95]]), n_bins, 4, 2
    )
    pi = P.shape_init_probs(stats.p_steady, p_th=1e-4)
    obs = np.full((n_bins + 1, 50), 1e-3, np.float32)
    obs[15, :] = 1.0
    obs[17, 25] = 5.0  # outlier spike: Viterbi should not jump for one frame
    obs /= obs.sum(axis=0, keepdims=True)
    path = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
    assert np.all(path == 15)
