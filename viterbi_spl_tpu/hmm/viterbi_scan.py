"""Exact parallel-scan Viterbi: associative max-plus matrix scan.

The forward recursion is a scan over max-plus matrix-vector products; it
parallelizes EXACTLY (no halos, no convergence assumptions) by lifting each
frame to the max-plus matrix

    M_t[i, j] = log A[i, j] + log b_t[j]

and composing with the (associative) max-plus matrix product
(M1 (x) M2)[i, j] = max_k M1[i, k] + M2[k, j]. An inclusive
jax.lax.associative_scan then yields prefix products P_t with
T1[t] = max_i (log pi_0[i] + P_t[i, :]) for all t in O(log T) depth.

Cost is O(T S^3 / depth-parallelism) vs the sequential kernel's O(T S^2):
the right tool when sequence-parallel latency matters more than FLOPs (very
long tracks spread over many devices) or as the exact cross-check for the
halo-based `dist.sharded_viterbi` scheme, which is what the tests use it
for. For tie-breaking parity the composition tracks max-plus products only
for T1 values; backpointers are reconstructed per frame exactly as in the
Pallas backtrace (first-argmax over T1[t-1] + log B[s_t]) — bit-identical
to the oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .viterbi import TINY, prepare_log_params


@jax.jit
def _maxplus_compose(a, b):
    """[., S, S] (x) [., S, S] max-plus matrix product (batched)."""
    return jnp.max(a[..., :, :, None] + b[..., None, :, :], axis=-2)


@jax.jit
def viterbi_t1_scan(log_A, log_pi, log_obs):
    """All T1 rows via associative scan. log_A [S, S] (= log A, NOT
    transposed), log_pi [S], log_obs [T, S]. Returns T1 [T, S] f32."""
    T, S = log_obs.shape
    # M_t[i, j] = log A[i, j] + log b_t[j], for t >= 1
    Ms = log_A[None, :, :] + log_obs[1:, None, :]  # [T-1, S, S]
    t1_0 = (log_pi + log_obs[0])[None, :]  # [1, S]
    if T == 1:
        return t1_0
    prefixes = jax.lax.associative_scan(_maxplus_compose, Ms)  # [T-1, S, S]
    # T1[t] = max_i (T1[0][i] + P_t[i, :])
    t1_rest = jnp.max(t1_0[0][None, :, None] + prefixes, axis=1)
    return jnp.concatenate([t1_0, t1_rest], axis=0)


@jax.jit
def _backtrace_from_t1(log_B, t1, log_obs):
    """Reverse chase reconstructing backpointers from T1 rows (exact,
    first-argmax): log_B [S, S] = log A.T."""
    T, S = t1.shape
    lane = jnp.arange(S, dtype=jnp.int32)
    last = jnp.argmax(t1[-1]).astype(jnp.int32)

    def step(s_next, t1_prev_row):
        # s_{t} = first-argmax(T1[t] + log B[s_{t+1}]) given t1_prev_row = T1[t]
        cand = t1_prev_row + log_B[s_next]
        m = jnp.max(cand)
        bp = jnp.min(jnp.where(cand == m, lane, S)).astype(jnp.int32)
        return bp, bp

    _, states = jax.lax.scan(step, last, t1[:-1], reverse=True)
    return jnp.concatenate([states, last[None]], axis=0)


def viterbi_decode_scan(*, transition_matrix, prob_init, probs_st) -> np.ndarray:
    """Oracle-signature decode through the associative-scan path."""
    log_B, log_pi = prepare_log_params(transition_matrix, prob_init)
    log_A = np.ascontiguousarray(log_B.T)
    log_obs = jnp.log(jnp.asarray(np.asarray(probs_st, np.float32).T) + TINY)
    t1 = viterbi_t1_scan(jnp.asarray(log_A), jnp.asarray(log_pi), log_obs)
    states = _backtrace_from_t1(jnp.asarray(log_B), t1, log_obs)
    return np.asarray(states, np.int64)
