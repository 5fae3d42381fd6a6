"""Re-measure the banded decode's forward/backtrace split on-chip.

Baseline for the round-2 roofline work (VERDICT #1): times the banded
forward and the dense backtrace separately at the bench shape
(N=128, T=32768, 361 bins padded to 384, block 64).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vspl_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from viterbi_spl_tpu.hmm import params as hmm_params
from viterbi_spl_tpu.hmm.viterbi import prepare_log_params
from viterbi_spl_tpu.hmm.viterbi_banded import (
    extract_banded_structure,
    viterbi_forward_pallas_banded_batch,
)
from viterbi_spl_tpu.hmm.viterbi_pallas import (
    viterbi_backtrace_pallas_batch,
    viterbi_forward_pallas_batch,
)


def bench_matrix(n_bins=360):
    rng = np.random.default_rng(0)
    q = [np.clip(180 + np.cumsum(rng.integers(-3, 4, 5000)), 0, n_bins - 1)]
    stats = hmm_params.count_statistics(q, n_bins)
    A = hmm_params.shape_transition_matrix(
        stats.transition_counts, np.array([[0.98, 0.02], [0.02, 0.98]]),
        n_bins, hmm_params.single_side_d_max(0.01, 60), floor=2)
    pi = hmm_params.shape_init_probs(stats.p_steady, p_th=1e-4)
    return A, pi


def timed(fn, iters=5):
    _ = int(jnp.sum(fn()))  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        _ = int(jnp.sum(fn()))
    return (time.perf_counter() - t0) / iters


def main():
    n_bins, P, N, T, BLOCK = 360, 384, 128, 1 << 15, 64
    S = n_bins + 1
    A, pi = bench_matrix(n_bins)
    log_B, log_pi = prepare_log_params(A, pi, pad_to=P)
    log_B_d, log_pi_d = jnp.asarray(log_B), jnp.asarray(log_pi)
    bs = extract_banded_structure(A, P)

    key = jax.random.PRNGKey(0)
    log_obs = jax.random.uniform(key, (N, T, P), jnp.float32, -20.0, 0.0)
    log_obs = jnp.where(
        jnp.arange(P)[None, None, :] < S, log_obs, jnp.float32(-1e30)
    ).block_until_ready()
    lens = jnp.full((N,), T, jnp.int32)

    fwd = jax.jit(lambda o: viterbi_forward_pallas_banded_batch(
        bs, log_pi_d, o, lens, block_frames=BLOCK, interpret=False)[1])
    t_fwd = timed(lambda: fwd(log_obs))
    print(f"banded forward:  {t_fwd*1e3:8.2f} ms  "
          f"({N*T/t_fwd/1e6:.1f} M frames/s)")

    t1, t1m1 = jax.jit(lambda o: viterbi_forward_pallas_banded_batch(
        bs, log_pi_d, o, lens, block_frames=BLOCK, interpret=False))(log_obs)
    last = jnp.argmax(t1, axis=1).astype(jnp.int32).block_until_ready()
    t1m1 = t1m1.block_until_ready()

    bt = jax.jit(lambda m, l: viterbi_backtrace_pallas_batch(
        m, log_B_d, l, lens, block_frames=BLOCK, interpret=False))
    t_bt = timed(lambda: bt(t1m1, last))
    print(f"dense backtrace: {t_bt*1e3:8.2f} ms  "
          f"({N*T/t_bt/1e6:.1f} M frames/s)")
    tot = t_fwd + t_bt
    print(f"total:           {tot*1e3:8.2f} ms  "
          f"({N*T/tot/1e6:.1f} M frames/s)")


if __name__ == "__main__":
    main()
