"""Time the v4 (source-profile classes) banded forward + full decode at the
bench shape, ragged vs full-length, on the real chip.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_banded_v4_timing.py
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
from viterbi_spl_tpu.hmm.viterbi_pallas import viterbi_backtrace_pallas_batch


def main():
    n_bins, P, N, T, BLOCK = 360, 384, 128, 1 << 15, 64
    S = n_bins + 1
    rng = np.random.default_rng(0)
    q = [np.clip(180 + np.cumsum(rng.integers(-3, 4, 5000)), 0, n_bins - 1)]
    stats = hmm_params.count_statistics(q, n_bins)
    A = hmm_params.shape_transition_matrix(
        stats.transition_counts, np.array([[0.98, 0.02], [0.02, 0.98]]),
        n_bins, hmm_params.single_side_d_max(0.01, 60), floor=2)
    pi = hmm_params.shape_init_probs(stats.p_steady, p_th=1e-4)
    log_B, log_pi = prepare_log_params(A, pi, pad_to=P)
    bs = extract_banded_structure(A, P)
    log_pi_d = jnp.asarray(log_pi)
    log_B_d = jnp.asarray(log_B)

    key = jax.random.PRNGKey(0)
    log_obs = jax.random.uniform(key, (N, T, P), jnp.float32, -20.0, 0.0)
    log_obs = jnp.where(
        jnp.arange(P)[None, None, :] < S, log_obs, jnp.float32(-1e30)
    ).block_until_ready()

    lens_full = jnp.full((N,), T, jnp.int32)
    lens_np = np.full(N, T, np.int32)
    lens_np[0] = 2000
    lens_ragged = jnp.asarray(lens_np)

    def timeit(fn, iters=5):
        _ = int(jnp.sum(fn()))  # compile + sync
        t0 = time.perf_counter()
        for _ in range(iters):
            _ = int(jnp.sum(fn()))
        return (time.perf_counter() - t0) / iters

    for name, lens in (("full-length", lens_full), ("ragged", lens_ragged)):
        dt = timeit(lambda: viterbi_forward_pallas_banded_batch(
            bs, log_pi_d, log_obs, lens, block_frames=BLOCK,
            interpret=False)[1])
        print(f"forward {name:12s} {dt*1e3:8.2f} ms "
              f"({N*T/dt/1e6:.1f} M frames/s)")

        def full():
            t1, t1m1 = viterbi_forward_pallas_banded_batch(
                bs, log_pi_d, log_obs, lens, block_frames=BLOCK,
                interpret=False)
            last = jnp.argmax(t1, axis=1).astype(jnp.int32)
            return viterbi_backtrace_pallas_batch(
                t1m1, log_B_d, last, lens, block_frames=BLOCK,
                interpret=False)
        dt = timeit(full)
        print(f"decode  {name:12s} {dt*1e3:8.2f} ms "
              f"({N*T/dt/1e6:.1f} M frames/s)")


if __name__ == "__main__":
    main()
