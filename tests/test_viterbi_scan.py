"""Associative-scan (exact parallel) Viterbi vs oracle."""

import numpy as np
import pytest

from conftest import random_hmm
from viterbi_spl_tpu.hmm.oracle import viterbi_oracle, viterbi_oracle_forward
from viterbi_spl_tpu.hmm.viterbi_scan import viterbi_decode_scan, viterbi_t1_scan


@pytest.mark.parametrize("S,T", [(17, 64), (45, 100), (90, 33)])
def test_scan_decode_matches_oracle(rng, S, T):
    A, pi, obs = random_hmm(rng, S, T)
    expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
    got = viterbi_decode_scan(transition_matrix=A, prob_init=pi, probs_st=obs)
    np.testing.assert_array_equal(expected, got)


def test_scan_t1_close_to_sequential(rng):
    """T1 values agree with the sequential recursion to float tolerance
    (association order of the max-plus adds differs)."""
    import jax.numpy as jnp
    from viterbi_spl_tpu.hmm.viterbi import TINY, prepare_log_params

    S, T = 33, 80
    A, pi, obs = random_hmm(rng, S, T)
    T1_seq, _ = viterbi_oracle_forward(transition_matrix=A, prob_init=pi, probs_st=obs)
    log_B, log_pi = prepare_log_params(A, pi)
    log_obs = jnp.log(jnp.asarray(obs.T) + TINY)
    T1_scan = np.asarray(
        viterbi_t1_scan(jnp.asarray(log_B.T.copy()), jnp.asarray(log_pi), log_obs)
    )
    np.testing.assert_allclose(T1_seq, T1_scan, rtol=1e-4, atol=1e-3)


def test_scan_single_frame(rng):
    A, pi, obs = random_hmm(rng, 20, 1)
    got = viterbi_decode_scan(transition_matrix=A, prob_init=pi, probs_st=obs)
    exp = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
    np.testing.assert_array_equal(exp, got)
