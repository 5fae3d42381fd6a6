"""Log-domain Viterbi decoding as pure JAX (lax.scan), vmap-able over tracks.

Same DP as the reference's canonical decoder (dcnet/tf_viterbi_decoding.py:
156-263): with A row-stochastic and B = log(A.T + tiny),

    T1[0]    = log pi + log b_0
    T1[t][s] = max_{s'} (T1[t-1][s'] + B[s, s']) + log b_t[s]
    T2[t][s] = argmax_{s'} (first-max tie-breaking, as np.argmax)

then a backward pointer chase from argmax T1[-1]. All tables are float32;
the tiny floor is float32 tiny, matching the reference exactly.

This module is the XLA-compiled baseline; `viterbi_pallas` provides the
hand-tuned kernel and `dist.sharded_viterbi` the multi-device variant. All
are tested to produce identical state paths to `oracle.viterbi_oracle`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TINY = np.float32(np.finfo(np.float32).tiny)

# Fill value for padded states: never wins an argmax against real states and
# does not overflow when accumulated across two adds (-1e30 + -1e30 = -inf,
# which max/argmax still handle).
NEG_PAD = np.float32(-1e30)


def prepare_log_params(transition_matrix, prob_init, pad_to: int | None = None):
    """Host-side prep: (A, pi) -> (log(A.T)+tiny [S,S], log pi [S]) float32.

    Optionally pads the state dimension to `pad_to` (lane alignment for TPU
    kernels) with NEG_PAD rows/cols so padded states are unreachable.
    Computed with NumPy so every decoder consumes bit-identical tables.
    """
    A = np.asarray(transition_matrix, np.float32)
    pi = np.asarray(prob_init, np.float32)
    S = A.shape[0]
    if A.shape != (S, S) or pi.shape != (S,):
        raise ValueError(f"bad shapes A={A.shape} pi={pi.shape}")
    if not np.allclose(A.sum(axis=1), 1.0):
        raise ValueError("transition matrix rows must sum to 1")
    if not np.isclose(pi.sum(), 1.0):
        raise ValueError("prob_init must sum to 1")

    log_B = np.ascontiguousarray(np.log(A.T + TINY), dtype=np.float32)
    log_pi = np.log(pi + TINY).astype(np.float32)
    if pad_to is not None and pad_to > S:
        P = pad_to
        padded_B = np.full((P, P), NEG_PAD, np.float32)
        padded_B[:S, :S] = log_B
        padded_pi = np.full((P,), NEG_PAD, np.float32)
        padded_pi[:S] = log_pi
        log_B, log_pi = padded_B, padded_pi
    return log_B, log_pi


def log_obs_fn(probs_ts: jnp.ndarray) -> jnp.ndarray:
    """log(obs + tiny) — probs_ts is time-major [T, S] (or [..., T, S])."""
    return jnp.log(probs_ts.astype(jnp.float32) + TINY)


@functools.partial(jax.jit, static_argnames=())
def viterbi_forward_jax(log_B, log_pi, log_obs):
    """Forward DP. Args are float32: log_B [S,S] (= log A.T), log_pi [S],
    log_obs [T,S] time-major. Returns (T1_last [S], T2 [T,S] int32) — T2[0]
    is zeros (unused)."""
    S = log_B.shape[0]
    t1_0 = log_pi + log_obs[0]

    def step(carry, obs_t):
        scores = carry[None, :] + log_B  # [s, s']
        bp = jnp.argmax(scores, axis=1).astype(jnp.int32)
        new_carry = jnp.max(scores, axis=1) + obs_t
        return new_carry, bp

    t1_last, bps = jax.lax.scan(step, t1_0, log_obs[1:])
    T2 = jnp.concatenate([jnp.zeros((1, S), jnp.int32), bps], axis=0)
    return t1_last, T2


@jax.jit
def viterbi_backtrace_jax(T2, last_state):
    """Pointer chase: states[T-1] = last_state; states[t] = T2[t+1][states[t+1]]."""

    def step(s, bp_row):
        s = bp_row[s]
        return s, s

    _, rev_states = jax.lax.scan(step, last_state, T2[1:], reverse=True)
    return jnp.concatenate([rev_states, last_state[None]], axis=0)


def viterbi_decode_jax(*, transition_matrix, prob_init, probs_st) -> np.ndarray:
    """Convenience single-track decode matching the oracle's signature.

    probs_st is state-major [S, T] like the reference; returns [T] int32.
    """
    log_B, log_pi = prepare_log_params(transition_matrix, prob_init)
    log_obs = log_obs_fn(jnp.asarray(probs_st).T)
    t1_last, T2 = viterbi_forward_jax(jnp.asarray(log_B), jnp.asarray(log_pi), log_obs)
    last_state = jnp.argmax(t1_last).astype(jnp.int32)
    states = viterbi_backtrace_jax(T2, last_state)
    return np.asarray(states)


@functools.partial(jax.jit, static_argnames=())
def viterbi_decode_batch_jax(log_B, log_pi, log_obs_batch):
    """Batched decode: log_obs_batch [N, T, S] -> states [N, T] int32.

    Tracks share (log_B, log_pi); use vmap externally for per-track params.
    """

    def one(log_obs):
        t1_last, T2 = viterbi_forward_jax(log_B, log_pi, log_obs)
        last_state = jnp.argmax(t1_last).astype(jnp.int32)
        return viterbi_backtrace_jax(T2, last_state)

    return jax.vmap(one)(log_obs_batch)
