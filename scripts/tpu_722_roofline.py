"""722-bin (jdc config) component roofline: obs kernel, banded forward,
banded backtrace, the fused-obs forward, and both e2e serving chains, at
N=64, T=4096, P=768, spw=16, d_max=40 — the numbers behind the DESIGN §3b
722 table. Also prints the 361-bin split at the serving shape.

All timed callables take their device arrays as ARGUMENTS (a zero-arg jit
closing over a device array inlines it as a constant and ships it through
the remote-compile tunnel — hangs for many minutes; see CLAUDE.md).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_722_roofline.py
"""

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vspl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viterbi_spl_tpu.hmm import params as hmm_params
    from viterbi_spl_tpu.hmm.obs_pallas import (
        pad_logits_reflect,
        shaun_log_obs_pallas,
    )
    from viterbi_spl_tpu.hmm.viterbi import prepare_log_params
    from viterbi_spl_tpu.hmm.viterbi_banded import (
        extract_banded_structure,
        viterbi_backtrace_pallas_banded_batch,
        viterbi_forward_pallas_banded_batch,
        viterbi_forward_pallas_banded_batch_obs,
    )

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    def timed(fn, *args, iters=8, out=lambda r: r):
        _ = float(jnp.sum(out(fn(*args))[:, -1].astype(jnp.float32)))
        t0 = time.perf_counter()
        sums = [jnp.sum(out(fn(*args))[:, -1].astype(jnp.float32))
                for _ in range(iters)]
        _ = float(sum(sums))
        return (time.perf_counter() - t0) / iters * 1e3

    for name, n_bins, spw, P, d_max, N, T in (
        ("361", 360, 5, 384, None, 128, 1 << 13),
        ("722", 721, 16, 768, 40, 64, 1 << 12),
    ):
        q = [np.clip(180 + np.cumsum(rng.integers(-3, 4, 5000)),
                     0, n_bins - 1)] if name == "361" else [
            np.clip(360 + np.cumsum(rng.integers(-3, 4, 5000)),
                    0, n_bins - 1)]
        stats = hmm_params.count_statistics(q, n_bins)
        A = hmm_params.shape_transition_matrix(
            stats.transition_counts,
            np.array([[0.98, 0.02], [0.02, 0.98]]), n_bins,
            d_max if d_max else hmm_params.single_side_d_max(0.01, 60),
            floor=2,
        )
        pi = hmm_params.shape_init_probs(stats.p_steady, p_th=1e-4)
        _, log_pi = prepare_log_params(A, pi, pad_to=P)
        bs = extract_banded_structure(A, P)
        log_pi_d = jnp.asarray(log_pi)

        raw = jax.random.normal(jax.random.PRNGKey(3), (N, T, n_bins),
                                jnp.float32) - 2.0
        padded = jnp.asarray(
            pad_logits_reflect(raw, spw, P)
        ).block_until_ready()
        lens = jnp.full((N,), T, jnp.int32)
        obs_cfg = dict(method="shaun", spw=spw, threshold_logit=0.0)

        def obs_fn(pl_in):
            return shaun_log_obs_pallas(
                pl_in, n_bins, spw, 0.0, block_frames=32, interpret=False)

        dt_obs = timed(obs_fn, padded)

        log_obs = obs_fn(padded).block_until_ready()

        def fwd_fn(lo, ln):
            return viterbi_forward_pallas_banded_batch(
                bs, log_pi_d, lo, ln, block_frames=64, interpret=False)

        dt_fwd = timed(fwd_fn, log_obs, lens, out=lambda r: r[1][:, 0])

        t1, t1m1 = fwd_fn(log_obs, lens)
        t1m1 = t1m1.block_until_ready()
        last = jnp.argmax(t1, axis=1).astype(jnp.int32).block_until_ready()

        def bt_fn(tm, la, ln):
            return viterbi_backtrace_pallas_banded_batch(
                bs, tm, la, ln, block_frames=64, interpret=False)

        dt_bt = timed(bt_fn, t1m1, last, lens)

        def fwd_obs_fn(pl_in, ln):
            return viterbi_forward_pallas_banded_batch_obs(
                bs, log_pi_d, pl_in, ln, obs_cfg, block_frames=64,
                interpret=False)

        dt_fwd_obs = timed(fwd_obs_fn, padded, lens,
                           out=lambda r: r[1][:, 0])

        @jax.jit
        def serve_fused(pl_in, ln):
            t1, t1m1 = viterbi_forward_pallas_banded_batch_obs(
                bs, log_pi_d, pl_in, ln, obs_cfg, block_frames=64,
                interpret=False)
            last = jnp.argmax(t1, axis=1).astype(jnp.int32)
            return viterbi_backtrace_pallas_banded_batch(
                bs, t1m1, last, ln, block_frames=64, interpret=False)

        dt_e2e = timed(serve_fused, padded, lens)

        @jax.jit
        def serve_two_step(pl_in, ln):
            lo = shaun_log_obs_pallas(
                pl_in, n_bins, spw, 0.0, block_frames=32, interpret=False)
            t1, t1m1 = viterbi_forward_pallas_banded_batch(
                bs, log_pi_d, lo, ln, block_frames=64, interpret=False)
            last = jnp.argmax(t1, axis=1).astype(jnp.int32)
            return viterbi_backtrace_pallas_banded_batch(
                bs, t1m1, last, ln, block_frames=64, interpret=False)

        dt_e2e2 = timed(serve_two_step, padded, lens)
        frames = N * T
        print(
            f"[{name}] N={N} T={T} P={P} spw={spw} d_max={bs.d_max} "
            f"classes={len(bs.classes)}:\n"
            f"   obs kernel        {dt_obs:7.2f} ms\n"
            f"   banded forward    {dt_fwd:7.2f} ms\n"
            f"   banded backtrace  {dt_bt:7.2f} ms\n"
            f"   fused-obs forward {dt_fwd_obs:7.2f} ms "
            f"(vs obs+fwd = {dt_obs + dt_fwd:.2f})\n"
            f"   e2e fused-fwd     {dt_e2e:7.2f} ms = "
            f"{frames / dt_e2e * 1e3 / 1e6:.1f} M frames/s\n"
            f"   e2e two-step      {dt_e2e2:7.2f} ms = "
            f"{frames / dt_e2e2 * 1e3 / 1e6:.1f} M frames/s",
            flush=True,
        )
        del padded, log_obs, t1m1, raw


if __name__ == "__main__":
    main()
