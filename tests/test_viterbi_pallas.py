"""Pallas Viterbi kernels (interpret mode on CPU) vs the NumPy oracle.

State paths must be bit-identical, including first-max tie-breaking, state
padding (321->384 etc.) and time padding/masking.
"""

import numpy as np
import pytest

from conftest import random_hmm
from viterbi_spl_tpu.hmm.oracle import viterbi_oracle
from viterbi_spl_tpu.hmm.viterbi_pallas import viterbi_decode_pallas


@pytest.mark.parametrize(
    "S,T,L",
    [
        (17, 50, 16),  # tiny, multiple chunks, remainder
        (321, 100, 32),
        (361, 64, 64),  # exactly one chunk
        (130, 33, 16),  # padding on both axes
    ],
)
def test_pallas_matches_oracle(rng, S, T, L):
    A, pi, obs = random_hmm(rng, S, T)
    expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
    got = viterbi_decode_pallas(
        transition_matrix=A, prob_init=pi, probs_st=obs, block_frames=L
    )
    np.testing.assert_array_equal(expected, got)


def test_pallas_sparse_obs(rng):
    S, T = 150, 90
    A, pi, obs = random_hmm(rng, S, T, sparse_obs=True)
    expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
    got = viterbi_decode_pallas(
        transition_matrix=A, prob_init=pi, probs_st=obs, block_frames=32
    )
    np.testing.assert_array_equal(expected, got)


def test_pallas_tie_breaking():
    S = 6
    A = np.full((S, S), 1.0 / S, np.float32)
    pi = np.full((S,), 1.0 / S)
    obs = np.full((S, 20), 1.0 / S, np.float32)
    got = viterbi_decode_pallas(
        transition_matrix=A, prob_init=pi, probs_st=obs, block_frames=16
    )
    assert np.all(got == 0)


def test_pallas_single_frame(rng):
    S = 40
    A, pi, obs = random_hmm(rng, S, 1)
    expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
    got = viterbi_decode_pallas(
        transition_matrix=A, prob_init=pi, probs_st=obs, block_frames=16
    )
    np.testing.assert_array_equal(expected, got)


def test_pallas_reference_artifacts(rng):
    import os

    if not os.path.exists("/root/reference/msnet/viterbi_transition_matrix.dat"):
        pytest.skip("reference artifacts not mounted")
    from viterbi_spl_tpu.io import load_array

    _, A = load_array("/root/reference/msnet/viterbi_transition_matrix.dat")
    _, pi = load_array("/root/reference/msnet/viterbi_init_probs.dat")
    T = 130
    obs = rng.random((321, T)).astype(np.float32) ** 8
    obs /= obs.sum(axis=0, keepdims=True)
    expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
    got = viterbi_decode_pallas(
        transition_matrix=A, prob_init=pi, probs_st=obs, block_frames=64
    )
    np.testing.assert_array_equal(expected, got)


def test_batched_decode_matches_oracle(rng):
    """Mixed-length batch, padded N, bit-identical paths per track."""
    from viterbi_spl_tpu.hmm.viterbi_pallas import viterbi_decode_batch_pallas

    S = 90
    A, pi, _ = random_hmm(rng, S, 10)
    tracks = []
    expected = []
    for T in (33, 64, 100):
        _, _, obs = random_hmm(rng, S, T)
        tracks.append(obs)
        expected.append(viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs))
    got = viterbi_decode_batch_pallas(
        transition_matrix=A, prob_init=pi, probs_st_list=tracks, block_frames=32
    )
    for e, g in zip(expected, got):
        np.testing.assert_array_equal(e, g)


def test_batched_decode_ties(rng):
    from viterbi_spl_tpu.hmm.viterbi_pallas import viterbi_decode_batch_pallas

    S = 6
    A = np.full((S, S), 1.0 / S, np.float32)
    pi = np.full(S, 1.0 / S)
    obs = np.full((S, 20), 1.0 / S, np.float32)
    got = viterbi_decode_batch_pallas(
        transition_matrix=A, prob_init=pi, probs_st_list=[obs, obs],
        block_frames=16,
    )
    assert all(np.all(g == 0) for g in got)
