"""JAX Viterbi vs NumPy oracle: state paths must be identical.

Mirrors the reference's own cross-implementation equality assertion
(dcnet/tf_viterbi_decoding.py:284) as a golden test over random and
peak-sparse HMMs at the reference's real state counts (321/361/722).
"""

import numpy as np
import pytest

from conftest import random_hmm
from viterbi_spl_tpu.hmm.oracle import viterbi_oracle, viterbi_oracle_forward
from viterbi_spl_tpu.hmm.viterbi import (
    log_obs_fn,
    prepare_log_params,
    viterbi_decode_jax,
    viterbi_forward_jax,
)


@pytest.mark.parametrize("S,T", [(17, 50), (321, 200), (361, 123), (722, 60)])
def test_jax_matches_oracle_dense(rng, S, T):
    A, pi, obs = random_hmm(rng, S, T)
    expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
    got = viterbi_decode_jax(transition_matrix=A, prob_init=pi, probs_st=obs)
    np.testing.assert_array_equal(expected, got)


@pytest.mark.parametrize("S,T", [(321, 300), (361, 150)])
def test_jax_matches_oracle_sparse_obs(rng, S, T):
    """Peak-picked observation probs are mostly exact zeros -> log(tiny) floors."""
    A, pi, obs = random_hmm(rng, S, T, sparse_obs=True)
    expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
    got = viterbi_decode_jax(transition_matrix=A, prob_init=pi, probs_st=obs)
    np.testing.assert_array_equal(expected, got)


def test_forward_tables_match(rng):
    S, T = 67, 40
    A, pi, obs = random_hmm(rng, S, T)
    T1, T2 = viterbi_oracle_forward(transition_matrix=A, prob_init=pi, probs_st=obs)
    log_B, log_pi = prepare_log_params(A, pi)
    import jax.numpy as jnp

    t1_last, T2_jax = viterbi_forward_jax(
        jnp.asarray(log_B), jnp.asarray(log_pi), log_obs_fn(jnp.asarray(obs).T)
    )
    np.testing.assert_array_equal(T2[1:], np.asarray(T2_jax)[1:])
    np.testing.assert_allclose(T1[-1], np.asarray(t1_last), rtol=1e-6, atol=1e-5)


def test_tie_breaking_first_max():
    """Exact ties must resolve to the lowest previous-state index."""
    S = 4
    A = np.full((S, S), 1.0 / S, np.float32)  # all transitions tie
    pi = np.full((S,), 1.0 / S)
    obs = np.full((S, 10), 1.0 / S, np.float32)
    expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
    got = viterbi_decode_jax(transition_matrix=A, prob_init=pi, probs_st=obs)
    np.testing.assert_array_equal(expected, got)
    assert np.all(expected == 0)


def test_reference_shipped_transition_matrix(rng):
    """Decode with the reference's real shipped 321-state HMM parameters."""
    import os

    if not os.path.exists("/root/reference/msnet/viterbi_transition_matrix.dat"):
        pytest.skip("reference artifacts not mounted")
    from viterbi_spl_tpu.io import load_array

    _, A = load_array("/root/reference/msnet/viterbi_transition_matrix.dat")
    _, pi = load_array("/root/reference/msnet/viterbi_init_probs.dat")
    T = 500
    # synthetic peaky posteriorgram
    obs = np.zeros((321, T), np.float32)
    path = np.clip(
        160 + np.cumsum(rng.integers(-2, 3, T)), 0, 319
    )
    for t in range(T):
        if rng.random() < 0.15:
            obs[320, t] = 1.0  # unvoiced
        else:
            obs[path[t], t] = 0.8
            obs[(path[t] + 5) % 320, t] = 0.15
            obs[320, t] = 0.05
    expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
    got = viterbi_decode_jax(transition_matrix=A, prob_init=pi, probs_st=obs)
    np.testing.assert_array_equal(expected, got)


def test_batched_decode(rng):
    from viterbi_spl_tpu.hmm.viterbi import viterbi_decode_batch_jax
    import jax.numpy as jnp

    S, T, N = 97, 64, 3
    A, pi, _ = random_hmm(rng, S, T)
    log_B, log_pi = prepare_log_params(A, pi)
    obs_batch = []
    expect = []
    for _ in range(N):
        _, _, obs = random_hmm(rng, S, T)
        obs_batch.append(obs.T)
        expect.append(viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs))
    log_obs_batch = log_obs_fn(jnp.asarray(np.stack(obs_batch)))
    got = viterbi_decode_batch_jax(
        jnp.asarray(log_B), jnp.asarray(log_pi), log_obs_batch
    )
    np.testing.assert_array_equal(np.stack(expect), np.asarray(got))
