"""Benchmark: Viterbi-decoded frames/sec/chip at 361 pitch bins.

The driver metric (BASELINE.json): dense-transition max-plus Viterbi decode
throughput on one TPU chip, 361 states (tonet configuration, padded to 384
lanes), forward DP + backtrace, decoded states produced on device.

Headline: the batched decoder (N=16 tracks share the VMEM-resident
transition matrix — the serving shape of BASELINE config 4, "decoded in
parallel over tracks"). Single-track throughput is reported in `detail`.

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

    # persistent compile cache: repeated driver runs skip the (slow remote)
    # Mosaic compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/vspl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viterbi_spl_tpu.hmm.oracle import viterbi_oracle
    from viterbi_spl_tpu.hmm.viterbi import prepare_log_params
    from viterbi_spl_tpu.hmm.viterbi_pallas import (
        viterbi_backtrace_pallas,
        viterbi_backtrace_pallas_batch,
        viterbi_forward_pallas,
        viterbi_forward_pallas_batch,
    )

    S, P = 361, 384
    T = 1 << 15  # frames per track
    N = 16  # tracks decoded together
    BLOCK_B, BLOCK_S = 128, 512

    rng = np.random.default_rng(0)
    A = rng.random((S, S), dtype=np.float32) ** 4
    A /= A.sum(axis=1, keepdims=True)
    A = A.astype(np.float32)
    A /= A.sum(axis=1, keepdims=True)
    pi = rng.random(S)
    pi /= pi.sum()
    log_B, log_pi = prepare_log_params(A, pi, pad_to=P)
    log_B_d, log_pi_d = jnp.asarray(log_B), jnp.asarray(log_pi)

    key = jax.random.PRNGKey(0)
    log_obs_b = jax.random.uniform(key, (N, T, P), jnp.float32, -20.0, 0.0)
    log_obs_b = jnp.where(
        jnp.arange(P)[None, None, :] < S, log_obs_b, jnp.float32(-1e30)
    )
    lens = jnp.full((N,), T, jnp.int32)

    @jax.jit
    def decode_batch(o):
        t1, t1m1 = viterbi_forward_pallas_batch(
            log_B_d, log_pi_d, o, lens, block_frames=BLOCK_B, interpret=False
        )
        last = jnp.argmax(t1, axis=1).astype(jnp.int32)
        return viterbi_backtrace_pallas_batch(
            t1m1, log_B_d, last, lens, block_frames=BLOCK_B, interpret=False
        )

    @jax.jit
    def decode_single(o):
        t1, t1m1 = viterbi_forward_pallas(
            log_B_d, log_pi_d, o, T, block_frames=BLOCK_S, interpret=False
        )
        last = jnp.argmax(t1).astype(jnp.int32)
        return viterbi_backtrace_pallas(
            t1m1, log_B_d, last, T, block_frames=BLOCK_S, interpret=False
        )

    # warmup/compile (checksums force completion through the async host)
    chk = int(jnp.sum(decode_batch(log_obs_b) % 7))
    chk_s = int(jnp.sum(decode_single(log_obs_b[0]) % 7))

    # correctness spot check vs oracle on a prefix
    T_CHK = 2000
    log_obs_chk = np.asarray(log_obs_b[0, :2048, :])
    t1, t1m1 = viterbi_forward_pallas(
        log_B_d, log_pi_d, jnp.asarray(log_obs_chk), T_CHK,
        block_frames=BLOCK_S, interpret=False,
    )
    st_chk = viterbi_backtrace_pallas(
        t1m1, log_B_d, jnp.argmax(t1).astype(jnp.int32), T_CHK,
        block_frames=BLOCK_S, interpret=False,
    )
    ok = _oracle_check(
        log_obs_chk[:T_CHK, :S], log_B, log_pi, np.asarray(st_chk)[:T_CHK], S
    )

    def timed(fn, arg, frames, iters=5):
        t0 = time.perf_counter()
        for _ in range(iters):
            chk = int(jnp.sum(fn(arg) % 7))
        dt = (time.perf_counter() - t0) / iters
        return frames / dt, dt

    fps_batch, dt_b = timed(decode_batch, log_obs_b, N * T)
    fps_single, dt_s = timed(decode_single, log_obs_b[0], T)

    # reference-semantics NumPy decoder baseline, extrapolated
    T_REF = 4000
    obs_ref = np.exp(np.asarray(log_obs_b[0, :T_REF, :S], np.float64))
    obs_ref = (obs_ref / obs_ref.sum(axis=1, keepdims=True)).astype(np.float32).T
    t0 = time.perf_counter()
    viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs_ref)
    ref_fps = T_REF / (time.perf_counter() - t0)

    result = {
        "metric": "viterbi_decode_frames_per_sec_per_chip_361bins",
        "value": round(fps_batch, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps_batch / ref_fps, 2),
        "detail": {
            "S": S,
            "padded_S": P,
            "tracks_per_batch": N,
            "frames_per_track": T,
            "batch_decode_ms": round(dt_b * 1e3, 3),
            "single_track_fps": round(fps_single, 1),
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
