"""TPU timing harness for the production Viterbi kernels.

Times, at the bench configuration (361 states padded to 384 lanes, N=128
tracks, T=32768 frames, banded shaped transition), the forward pass, the
backtrace, and the full decode. Run on the real chip:

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_kernel_timing.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vspl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viterbi_spl_tpu.hmm import params as hmm_params
    from viterbi_spl_tpu.hmm.viterbi import prepare_log_params
    from viterbi_spl_tpu.hmm.viterbi_banded import (
        extract_banded_structure,
        viterbi_forward_pallas_banded_batch,
    )
    from viterbi_spl_tpu.hmm.viterbi_pallas import viterbi_backtrace_pallas_batch

    n_bins = 360
    S, P = n_bins + 1, 384
    N, T, BLOCK = 128, 1 << 15, 64

    rng = np.random.default_rng(0)
    qtracks = [np.clip(180 + np.cumsum(rng.integers(-3, 4, 5000)), 0, n_bins - 1)]
    stats = hmm_params.count_statistics(qtracks, n_bins)
    A = hmm_params.shape_transition_matrix(
        stats.transition_counts, np.array([[0.98, 0.02], [0.02, 0.98]]),
        n_bins, hmm_params.single_side_d_max(0.01, 60), floor=2,
    )
    pi = hmm_params.shape_init_probs(stats.p_steady, p_th=1e-4)
    log_B, log_pi = prepare_log_params(A, pi, pad_to=P)
    log_B_d, log_pi_d = jnp.asarray(log_B), jnp.asarray(log_pi)
    bs = extract_banded_structure(A, P)
    assert bs is not None

    key = jax.random.PRNGKey(0)
    log_obs = jax.random.uniform(key, (N, T, P), jnp.float32, -20.0, 0.0)
    log_obs = jnp.where(
        jnp.arange(P)[None, None, :] < S, log_obs, jnp.float32(-1e30)
    ).block_until_ready()
    lens = jnp.full((N,), T, jnp.int32)

    def sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        return float(jnp.sum(leaf[:, -1].astype(jnp.float32)))

    def timed(fn, *args, iters=5):
        sync(fn(*args))  # warmup/compile
        t0 = time.perf_counter()
        for _ in range(iters):
            sync(fn(*args))
        return (time.perf_counter() - t0) / iters

    @jax.jit
    def fwd(o, l):
        return viterbi_forward_pallas_banded_batch(
            bs, log_pi_d, o, l, block_frames=BLOCK, interpret=False
        )[1]

    dt_f = timed(fwd, log_obs, lens)
    print(f"forward (banded):  {dt_f*1e3:8.2f} ms  {N*T/dt_f/1e6:6.2f} M fr/s",
          flush=True)

    t1m1 = fwd(log_obs, lens).block_until_ready()
    del log_obs
    last = jnp.zeros((N,), jnp.int32)

    @jax.jit
    def bt(t, la, l):
        return viterbi_backtrace_pallas_batch(
            t, log_B_d, la, l, block_frames=BLOCK, interpret=False
        )

    dt_b = timed(bt, t1m1, last, lens)
    print(f"backtrace (dense): {dt_b*1e3:8.2f} ms  {N*T/dt_b/1e6:6.2f} M fr/s",
          flush=True)
    tot = dt_f + dt_b
    print(f"full decode:       {tot*1e3:8.2f} ms  {N*T/tot/1e6:6.2f} M fr/s",
          flush=True)


if __name__ == "__main__":
    main()
