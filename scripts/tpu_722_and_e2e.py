"""TPU measurements: (1) 722-bin banded decode with the v2 forward,
(2) end-to-end serving throughput at 361 bins: sigmoid -> shaun observation
model -> banded decode, all on-chip."""
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

    def shaped(n_bins, d_max, P):
        q = [np.clip(n_bins // 2 + np.cumsum(rng.integers(-3, 4, 8000)),
                     0, n_bins - 1)]
        voiced = np.repeat(rng.random(401) > 0.3, 20)[:8000]
        q = [np.where(voiced, q[0], n_bins)]
        stats = hmm_params.count_statistics(q, n_bins)
        A = hmm_params.shape_transition_matrix(
            stats.transition_counts, stats.switch, n_bins, d_max, floor=2
        )
        pi = hmm_params.shape_init_probs(stats.p_steady)
        log_B, log_pi = prepare_log_params(A, pi, pad_to=P)
        return A, pi, log_B, log_pi

    # ---- (1) 722 bins, d_max=40, N=32, T=16384, BLOCK=32 ----
    n_bins, P = 721, 768
    A, pi, log_B, log_pi = shaped(n_bins, 40, P)
    bs = extract_banded_structure(A, P)
    assert bs is not None and bs.d_max == 40
    N, T, BLOCK = 32, 1 << 14, 32
    S = n_bins + 1
    key = jax.random.PRNGKey(0)
    lo = jax.random.uniform(key, (N, T, P), jnp.float32, -20.0, 0.0)
    lo = jnp.where(jnp.arange(P)[None, None, :] < S, lo, jnp.float32(-1e30))
    lo = lo.block_until_ready()
    lens = jnp.full((N,), T, jnp.int32)
    log_B_d, log_pi_d = jnp.asarray(log_B), jnp.asarray(log_pi)

    @jax.jit
    def dec722(o, l):
        t1, t1m1 = viterbi_forward_pallas_banded_batch(
            bs, log_pi_d, o, l, block_frames=BLOCK, interpret=False
        )
        last = jnp.argmax(t1, axis=1).astype(jnp.int32)
        return viterbi_backtrace_pallas_batch(
            t1m1, log_B_d, last, l, block_frames=BLOCK, interpret=False
        )

    dt = timed(dec722, lo, lens)
    print(f"722-bin decode (N=32): {dt*1e3:8.2f} ms  {N*T/dt/1e6:6.2f} M fr/s",
          flush=True)
    del lo

    # ---- (2) end-to-end serving at 361 bins: logits -> obs -> decode ----
    n_bins, P = 360, 384
    A2, pi2, log_B2, log_pi2 = shaped(n_bins, 14, P)
    bs2 = extract_banded_structure(A2, P)
    N, T, BLOCK = 128, 1 << 13, 64  # logits+obs+t1m1 all live: smaller T
    S = n_bins + 1
    logits = jax.random.normal(jax.random.PRNGKey(1), (N, T, n_bins),
                               jnp.float32) - 2.0
    logits = logits.block_until_ready()
    lens = jnp.full((N,), T, jnp.int32)
    log_B2_d, log_pi2_d = jnp.asarray(log_B2), jnp.asarray(log_pi2)
    th_logit = float(np.log(0.5 / 0.5))

    @jax.jit
    def e2e(lg, l):
        obs = jax.vmap(
            lambda x: shaun_observation_probs(x, th_logit, 5, 0.8, 2.0)
        )(lg)  # [N, T, S]
        log_obs = jnp.log(obs + TINY)
        log_obs = jnp.pad(
            log_obs, ((0, 0), (0, 0), (0, P - S)), constant_values=NEG_PAD
        )
        t1, t1m1 = viterbi_forward_pallas_banded_batch(
            bs2, log_pi2_d, log_obs, l, block_frames=BLOCK, interpret=False
        )
        last = jnp.argmax(t1, axis=1).astype(jnp.int32)
        return viterbi_backtrace_pallas_batch(
            t1m1, log_B2_d, last, l, block_frames=BLOCK, interpret=False
        )

    dt2 = timed(e2e, logits, lens)
    print(f"e2e obs+decode (N=128): {dt2*1e3:8.2f} ms  "
          f"{N*T/dt2/1e6:6.2f} M fr/s", flush=True)


if __name__ == "__main__":
    main()
