"""Exact banded fast path vs dense kernel and oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from viterbi_spl_tpu.hmm import params as P
from viterbi_spl_tpu.hmm.oracle import viterbi_oracle
from viterbi_spl_tpu.hmm.viterbi import prepare_log_params, NEG_PAD, TINY
from viterbi_spl_tpu.hmm.viterbi_banded import (
    extract_banded_structure,
    viterbi_forward_pallas_banded_batch,
)
from viterbi_spl_tpu.hmm.viterbi_pallas import (
    viterbi_decode_batch_pallas,
    viterbi_forward_pallas_batch,
)


def shaped_hmm(rng, n_bins=60, d_max=6):
    tracks = [np.clip(30 + np.cumsum(rng.integers(-2, 3, 2000)), 0, n_bins - 1)]
    stats = P.count_statistics(tracks, n_bins)
    A = P.shape_transition_matrix(
        stats.transition_counts, np.array([[0.98, 0.02], [0.02, 0.98]]),
        n_bins, d_max, floor=2,
    )
    pi = P.shape_init_probs(stats.p_steady, p_th=1e-4)
    return A, pi


def test_structure_detection(rng):
    A, pi = shaped_hmm(rng)
    bs = extract_banded_structure(A, pad_to=128)
    assert bs is not None
    assert bs.d_max == 6 and bs.n_bins == 60

    # analytic (dense) imm matrix must NOT match
    dense = P.imm_transition_matrix(4, 40)
    assert extract_banded_structure(dense, 128) is None

    # random dense must not match
    R = rng.random((20, 20)).astype(np.float32)
    R /= R.sum(1, keepdims=True)
    assert extract_banded_structure(R, 128) is None


def test_banded_forward_bitwise_equals_dense(rng):
    A, pi = shaped_hmm(rng)
    S = A.shape[0]
    Ppad = 128
    log_B, log_pi = prepare_log_params(A, pi, pad_to=Ppad)
    bs = extract_banded_structure(A, Ppad)

    N, T_pad = 8, 64
    obs = np.zeros((N, T_pad, Ppad), np.float32)
    for i in range(N):
        o = rng.random((S, T_pad)).astype(np.float32) ** 6
        o /= o.sum(0, keepdims=True)
        obs[i, :, :S] = o.T
    log_obs = np.log(obs + TINY)
    log_obs[:, :, S:] = NEG_PAD
    lens = np.full(N, T_pad, np.int32)
    lens[1] = 40  # mixed lengths

    t1_d, t1m1_d = viterbi_forward_pallas_batch(
        jnp.asarray(log_B), jnp.asarray(log_pi), jnp.asarray(log_obs), lens,
        block_frames=32,
    )
    t1_b, t1m1_b = viterbi_forward_pallas_banded_batch(
        bs, jnp.asarray(log_pi), jnp.asarray(log_obs), lens, block_frames=32
    )
    # bit-identical on the real state lanes; pad lanes (>= S) hold garbage
    # by contract (they can never win an argmax: obs pads are -1e30)
    np.testing.assert_array_equal(
        np.asarray(t1_d)[:, :S], np.asarray(t1_b)[:, :S]
    )
    np.testing.assert_array_equal(
        np.asarray(t1m1_d)[:, :, :S], np.asarray(t1m1_b)[:, :, :S]
    )


def test_banded_decode_matches_oracle(rng):
    A, pi = shaped_hmm(rng)
    S = A.shape[0]
    tracks, expected = [], []
    for T in (50, 90):
        path = np.clip(30 + np.cumsum(rng.integers(-1, 2, T)), 0, S - 2)
        obs = np.full((S, T), 1e-4, np.float32)
        obs[path, np.arange(T)] = 1.0
        obs /= obs.sum(0, keepdims=True)
        tracks.append(obs)
        expected.append(viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs))
    got = viterbi_decode_batch_pallas(
        transition_matrix=A, prob_init=pi, probs_st_list=tracks,
        block_frames=32, allow_banded=True,
    )
    for e, g in zip(expected, got):
        np.testing.assert_array_equal(e, g)


def test_banded_backtrace_bitwise_equals_dense(rng):
    from viterbi_spl_tpu.hmm.viterbi_banded import (
        viterbi_backtrace_pallas_banded_batch,
    )
    from viterbi_spl_tpu.hmm.viterbi_pallas import (
        viterbi_backtrace_pallas_batch,
    )

    A, pi = shaped_hmm(rng)
    S = A.shape[0]
    Ppad = 128
    log_B, log_pi = prepare_log_params(A, pi, pad_to=Ppad)
    bs = extract_banded_structure(A, Ppad)

    N, T_pad = 8, 64
    obs = np.zeros((N, T_pad, Ppad), np.float32)
    for i in range(N):
        o = rng.random((S, T_pad)).astype(np.float32) ** 6
        o /= o.sum(0, keepdims=True)
        obs[i, :, :S] = o.T
    # tie-heavy tracks: constant observations force equal-max candidates,
    # exercising the first-max (min source lane) semantics
    obs[-2, :, :S] = 1.0 / S
    obs[-1, :, :S] = obs[-1, 0:1, :S]
    log_obs = np.log(obs + TINY)
    log_obs[:, :, S:] = NEG_PAD
    lens = np.full(N, T_pad, np.int32)
    lens[1] = 40  # mixed lengths
    lens[2] = 1

    t1, t1m1 = viterbi_forward_pallas_banded_batch(
        bs, jnp.asarray(log_pi), jnp.asarray(log_obs), lens, block_frames=32
    )
    last = jnp.argmax(t1[:, :S], axis=1).astype(jnp.int32)
    dense = viterbi_backtrace_pallas_batch(
        t1m1, jnp.asarray(log_B), last, lens, block_frames=32
    )
    banded = viterbi_backtrace_pallas_banded_batch(
        bs, t1m1, last, lens, block_frames=32
    )
    for i in range(N):
        np.testing.assert_array_equal(
            np.asarray(dense)[i, : lens[i]], np.asarray(banded)[i, : lens[i]]
        )


def test_banded_backtrace_decode_matches_oracle_722_shape(rng):
    """jdc-shaped structure (d_max 40) through the full banded decode."""
    A, pi = shaped_hmm(rng, n_bins=120, d_max=40)
    S = A.shape[0]
    tracks, expected = [], []
    for T in (50, 90):
        path = np.clip(60 + np.cumsum(rng.integers(-2, 3, T)), 0, S - 2)
        obs = np.full((S, T), 1e-4, np.float32)
        obs[path, np.arange(T)] = 1.0
        obs /= obs.sum(0, keepdims=True)
        tracks.append(obs)
        expected.append(
            viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
        )
    got = viterbi_decode_batch_pallas(
        transition_matrix=A, prob_init=pi, probs_st_list=tracks,
        block_frames=32, allow_banded=True,
    )
    for e, g in zip(expected, got):
        np.testing.assert_array_equal(e, g)
