"""Benchmark: Viterbi-decoded frames/sec/chip at 361 pitch bins.

The driver metric (BASELINE.json): dense-transition max-plus Viterbi decode
throughput on one TPU chip, 361 states (tonet configuration, padded to 384
lanes), forward DP + backtrace, decoded states produced on device.

vs_baseline compares against the reference's canonical optimized NumPy
decoder (dcnet/tf_viterbi_decoding.py:156-207 semantics, reimplemented in
hmm/oracle.py) measured on this host — the reference publishes no throughput
numbers, so its own CPU decoder is the baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from viterbi_spl_tpu.hmm.oracle import viterbi_oracle
    from viterbi_spl_tpu.hmm.viterbi import prepare_log_params
    from viterbi_spl_tpu.hmm.viterbi_pallas import (
        viterbi_backtrace_pallas,
        viterbi_forward_pallas,
    )

    S = 361
    P = 384
    T = 1 << 16  # 65536 frames (~11 min of audio at 10 ms hop)
    BLOCK = 512

    rng = np.random.default_rng(0)
    A = rng.random((S, S), dtype=np.float32) ** 4
    A /= A.sum(axis=1, keepdims=True)
    A = A.astype(np.float32)
    A /= A.sum(axis=1, keepdims=True)
    pi = rng.random(S)
    pi /= pi.sum()
    log_B, log_pi = prepare_log_params(A, pi, pad_to=P)

    # synthetic peaky posteriorgram in log domain, generated on device
    key = jax.random.PRNGKey(0)
    log_obs = jax.random.uniform(key, (T, P), jnp.float32, -20.0, 0.0)
    log_obs = jnp.where(
        jnp.arange(P)[None, :] < S, log_obs, jnp.float32(-1e30)
    ).block_until_ready()
    log_B_d = jnp.asarray(log_B)
    log_pi_d = jnp.asarray(log_pi)

    import functools

    @jax.jit
    def decode(log_obs):
        t1_last, t1m1 = viterbi_forward_pallas(
            log_B_d, log_pi_d, log_obs, T, block_frames=BLOCK, interpret=False
        )
        last_state = jnp.argmax(t1_last).astype(jnp.int32)
        states = viterbi_backtrace_pallas(
            t1m1, log_B_d, last_state, T, block_frames=BLOCK, interpret=False
        )
        return states

    # warmup/compile (checksum forces real completion through the async host)
    chk = int(jnp.sum(decode(log_obs) % 7))

    # correctness spot check on a prefix (oracle is O(T*S^2) on host)
    T_CHK = 2000
    log_obs_chk = np.asarray(log_obs[:2048, :])
    t1_last, t1m1 = viterbi_forward_pallas(
        log_B_d, log_pi_d, jnp.asarray(log_obs_chk), T_CHK,
        block_frames=BLOCK, interpret=False,
    )
    st_chk = viterbi_backtrace_pallas(
        t1m1, log_B_d, jnp.argmax(t1_last).astype(jnp.int32), T_CHK,
        block_frames=BLOCK, interpret=False,
    )
    ok = _oracle_check(
        log_obs_chk[:T_CHK, :S], log_B, log_pi, np.asarray(st_chk)[:T_CHK], S
    )

    # timed runs (each iteration syncs via a scalar checksum readback)
    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        chk = int(jnp.sum(decode(log_obs) % 7))
    dt = (time.perf_counter() - t0) / n_iters
    fps = T / dt

    # reference-semantics NumPy decoder baseline on a smaller T, extrapolated
    T_REF = 4000
    obs_ref = np.exp(
        np.asarray(log_obs[:T_REF, :S], np.float64)
    )
    obs_ref = (obs_ref / obs_ref.sum(axis=1, keepdims=True)).astype(np.float32).T
    t0 = time.perf_counter()
    viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs_ref)
    ref_dt = time.perf_counter() - t0
    ref_fps = T_REF / ref_dt

    result = {
        "metric": "viterbi_decode_frames_per_sec_per_chip_361bins",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / ref_fps, 2),
        "detail": {
            "S": S,
            "padded_S": P,
            "T": T,
            "block_frames": BLOCK,
            "decode_ms": round(dt * 1e3, 3),
            "numpy_reference_fps": round(ref_fps, 1),
            "path_matches_oracle": bool(ok),
        },
    }
    print(json.dumps(result))


def _oracle_check(log_obs, log_B, log_pi, got, S):
    """Replicate the oracle DP directly in log domain (no prob round trip)."""
    T = log_obs.shape[0]
    T1 = log_pi[:S] + log_obs[0]
    T2 = np.zeros((T, S), np.int64)
    for t in range(1, T):
        scores = T1[None, :] + log_B[:S, :S]
        T2[t] = np.argmax(scores, axis=1)
        T1 = scores[np.arange(S), T2[t]] + log_obs[t]
    states = np.empty(T, np.int64)
    s = int(np.argmax(T1))
    states[-1] = s
    for t in range(T - 2, -1, -1):
        s = T2[t + 1, s]
        states[t] = s
    return np.array_equal(states, got)


if __name__ == "__main__":
    main()
