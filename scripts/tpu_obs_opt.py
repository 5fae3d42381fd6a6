"""Profile the shaun obs model stages on TPU and test a reduce_window
peak-finder variant (bitwise-identical: same fp max values)."""
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vspl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viterbi_spl_tpu.hmm.obs import find_peaks, shaun_observation_probs
    from viterbi_spl_tpu.hmm.viterbi import NEG_PAD, TINY

    N, T, n_bins, P = 128, 1 << 13, 360, 384
    S = n_bins + 1
    spw = 5
    logits = jax.random.normal(jax.random.PRNGKey(1), (N, T, n_bins),
                               jnp.float32) - 2.0
    logits = logits.block_until_ready()

    def sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        return float(jnp.sum(leaf[:, -1].astype(jnp.float32)))

    def timed(fn, *args, iters=5):
        sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            sync(fn(*args))
        return (time.perf_counter() - t0) / iters

    # stage 1: peak finder alone (current shifted-max)
    @jax.jit
    def peaks_cur(lg):
        return jax.vmap(lambda x: find_peaks(x, spw))(lg)

    dt = timed(peaks_cur, logits)
    print(f"find_peaks (shifted-max): {dt*1e3:8.2f} ms", flush=True)

    # reduce_window variant
    def find_peaks_rw(x):
        padded = jnp.pad(x, [(0, 0), (spw, spw)], mode="reflect")
        R = jax.lax.reduce_window(
            padded, -jnp.inf, jax.lax.max, (1, spw), (1, 1), "VALID"
        )
        left = R[:, 0:n_bins]
        right = R[:, spw + 1 : spw + 1 + n_bins]
        return (x > left) & (x >= right)

    @jax.jit
    def peaks_rw(lg):
        return jax.vmap(find_peaks_rw)(lg)

    dt = timed(peaks_rw, logits)
    print(f"find_peaks (reduce_window): {dt*1e3:8.2f} ms", flush=True)
    same = bool(jnp.all(peaks_cur(logits) == peaks_rw(logits)))
    print(f"identical masks: {same}", flush=True)

    # stage 2: full obs (probs) without log/pad
    @jax.jit
    def obs_probs(lg):
        return jax.vmap(
            lambda x: shaun_observation_probs(x, 0.0, spw, 0.8, 2.0)
        )(lg)

    dt = timed(obs_probs, logits)
    print(f"obs probs only:           {dt*1e3:8.2f} ms", flush=True)

    # stage 3: + log + pad (the full serving prep)
    @jax.jit
    def obs_full(lg):
        obs = obs_probs(lg)
        log_obs = jnp.log(obs + TINY)
        return jnp.pad(
            log_obs, ((0, 0), (0, 0), (0, P - S)), constant_values=NEG_PAD
        )

    dt = timed(obs_full, logits)
    print(f"obs probs+log+pad:        {dt*1e3:8.2f} ms", flush=True)


def fused():
    import time
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vspl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viterbi_spl_tpu.hmm.obs import shaun_observation_probs
    from viterbi_spl_tpu.hmm.obs_pallas import (
        pad_logits_reflect,
        shaun_log_obs_pallas,
    )
    from viterbi_spl_tpu.hmm.viterbi import NEG_PAD, TINY

    N, T, n_bins, P = 128, 1 << 13, 360, 384
    spw = 5
    logits = jax.random.normal(jax.random.PRNGKey(1), (N, T, n_bins),
                               jnp.float32) - 2.0
    logits = logits.block_until_ready()

    def sync(r):
        return float(jnp.sum(r[:, -1].astype(jnp.float32)))

    def timed(fn, *args, iters=5):
        sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            sync(fn(*args))
        return (time.perf_counter() - t0) / iters

    for bf in (32, 16):
        @jax.jit
        def fused_obs(lg, bf=bf):
            padded = pad_logits_reflect(lg, spw, P)
            return shaun_log_obs_pallas(
                padded, n_bins, spw, 0.0, block_frames=bf, interpret=False
            )

        try:
            dt = timed(fused_obs, logits)
            print(f"fused obs (block={bf}): {dt*1e3:8.2f} ms  "
                  f"{N*T/dt/1e6:6.2f} M", flush=True)
        except Exception as e:
            print(f"fused obs (block={bf}) FAILED: {str(e)[:200]}", flush=True)
            continue
        # value check vs XLA path on one track
        got = np.asarray(fused_obs(logits))[0]
        obs = np.asarray(
            shaun_observation_probs(jnp.asarray(logits[0]), 0.0, spw)
        )
        want = np.full((T, P), NEG_PAD, np.float32)
        want[:, : n_bins + 1] = np.log(obs + TINY)
        err = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-6))
        print(f"  max rel err vs XLA path: {err:.2e}", flush=True)
        break


if __name__ == "__main__":
    main()
    fused()
