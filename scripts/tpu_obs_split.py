"""Split the e2e serving time: obs model alone vs decode alone, plus an
obs variant returning log-probs directly (skips the exp->log round trip)."""
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vspl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viterbi_spl_tpu.hmm import params as hmm_params
    from viterbi_spl_tpu.hmm.obs import shaun_observation_probs
    from viterbi_spl_tpu.hmm.viterbi import NEG_PAD, TINY, prepare_log_params
    from viterbi_spl_tpu.hmm.viterbi_banded import (
        extract_banded_structure,
        viterbi_forward_pallas_banded_batch,
    )
    from viterbi_spl_tpu.hmm.viterbi_pallas import viterbi_backtrace_pallas_batch

    def sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        return float(jnp.sum(leaf[:, -1].astype(jnp.float32)))

    def timed(fn, *args, iters=5):
        sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            sync(fn(*args))
        return (time.perf_counter() - t0) / iters

    rng = np.random.default_rng(0)
    n_bins, P = 360, 384
    S = n_bins + 1
    q = [np.clip(180 + np.cumsum(rng.integers(-3, 4, 8000)), 0, n_bins - 1)]
    voiced = np.repeat(rng.random(401) > 0.3, 20)[:8000]
    q = [np.where(voiced, q[0], n_bins)]
    stats = hmm_params.count_statistics(q, n_bins)
    A = hmm_params.shape_transition_matrix(
        stats.transition_counts, stats.switch, n_bins, 14, floor=2
    )
    pi = hmm_params.shape_init_probs(stats.p_steady)
    log_B, log_pi = prepare_log_params(A, pi, pad_to=P)
    bs = extract_banded_structure(A, P)

    N, T, BLOCK = 128, 1 << 13, 64
    logits = jax.random.normal(jax.random.PRNGKey(1), (N, T, n_bins),
                               jnp.float32) - 2.0
    logits = logits.block_until_ready()
    lens = jnp.full((N,), T, jnp.int32)
    th = 0.0

    @jax.jit
    def obs_only(lg):
        obs = jax.vmap(
            lambda x: shaun_observation_probs(x, th, 5, 0.8, 2.0)
        )(lg)
        log_obs = jnp.log(obs + TINY)
        return jnp.pad(
            log_obs, ((0, 0), (0, 0), (0, P - S)), constant_values=NEG_PAD
        )

    dt_o = timed(obs_only, logits)
    print(f"obs (probs->log):  {dt_o*1e3:8.2f} ms  {N*T/dt_o/1e6:6.2f} M",
          flush=True)

    log_obs = obs_only(logits).block_until_ready()
    log_B_d, log_pi_d = jnp.asarray(log_B), jnp.asarray(log_pi)

    @jax.jit
    def dec(o, l):
        t1, t1m1 = viterbi_forward_pallas_banded_batch(
            bs, log_pi_d, o, l, block_frames=BLOCK, interpret=False
        )
        last = jnp.argmax(t1, axis=1).astype(jnp.int32)
        return viterbi_backtrace_pallas_batch(
            t1m1, log_B_d, last, l, block_frames=BLOCK, interpret=False
        )

    dt_d = timed(dec, log_obs, lens)
    print(f"decode:            {dt_d*1e3:8.2f} ms  {N*T/dt_d/1e6:6.2f} M",
          flush=True)


if __name__ == "__main__":
    main()
