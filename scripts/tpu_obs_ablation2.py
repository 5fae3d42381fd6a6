"""Round 2 of the obs-kernel account: 2-D contiguous row blocking.

The observation model is frame-independent, so instead of [N, BLOCK, P]
blocks strided across the [N, T, P] array (128 strided 48 KB segments per
DMA), flatten to [N*T, P] and stream fully-contiguous [ROWS, P] blocks.
Measures the copy floor and the direct-log kernel in that layout at
several ROWS, vs the 3-D production blocks.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_obs_ablation2.py
"""

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vspl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from viterbi_spl_tpu.hmm.obs_pallas import (
        _VMEM_LIMIT,
        _window_max,
        pad_logits_reflect,
    )
    from viterbi_spl_tpu.hmm.viterbi import NEG_PAD, TINY

    assert jax.default_backend() == "tpu"

    N, T, n_bins, P, spw = 128, 1 << 13, 360, 384, 5
    raw = jax.random.normal(jax.random.PRNGKey(2), (N, T, n_bins),
                            jnp.float32) - 2.0
    padded = jnp.asarray(
        pad_logits_reflect(raw, spw, P)
    ).block_until_ready()
    flat = padded.reshape(N * T, P).block_until_ready()
    params = jnp.asarray([0.0, np.log(0.8 / 0.2), 2.0], jnp.float32)

    def timed(fn, *args, iters=8):
        _ = float(jnp.sum(fn(*args)[-1]))
        t0 = time.perf_counter()
        sums = [jnp.sum(fn(*args)[-1]) for _ in range(iters)]
        _ = float(sum(sums))
        return (time.perf_counter() - t0) / iters * 1e3

    def build2d(body, rows):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=((N * T) // rows,),
            in_specs=[pl.BlockSpec((rows, P), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((rows, P), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[],
        )
        call = pl.pallas_call(
            body, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((N * T, P), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )

        @jax.jit
        def run(pm, lg):
            return call(pm, lg)[0]

        return run

    def copy2d(params_ref, logits_ref, out_ref):
        out_ref[:, :] = logits_ref[:, :] * params_ref[2]

    def direct2d(params_ref, logits_ref, out_ref):
        th, offset, scale = params_ref[0], params_ref[1], params_ref[2]
        x = logits_ref[:, :]
        R = x.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, P), 1)
        data = jnp.logical_and(lane >= spw, lane < spw + n_bins)
        left = pltpu.roll(_window_max(x, spw, P, neg=False, axis=1), 1, 1)
        right = pltpu.roll(_window_max(x, spw, P, neg=True, axis=1), P - 1, 1)
        is_peak = jnp.logical_and(data, jnp.logical_and(x > left, x >= right))
        peak_vals = jnp.where(is_peak, x, NEG_PAD)
        gmax = jnp.max(peak_vals, axis=1, keepdims=True)
        any_peak = gmax > jnp.float32(NEG_PAD) / 2
        sign = jnp.where(gmax >= th, 1.0, -1.0).astype(jnp.float32)
        s = scale * (gmax - th) + sign * offset
        p_voiced = jnp.where(any_peak, jax.nn.sigmoid(s), 0.0)
        d = x - gmax
        exps = jnp.where(is_peak, jnp.exp(d), 0.0)
        denom = jnp.sum(exps, axis=1, keepdims=True)
        log_c = jnp.log(p_voiced + TINY) - jnp.log(jnp.maximum(denom, 1e-30))
        log_tiny = jnp.float32(np.log(np.float32(TINY)))
        lo = jnp.maximum(d + log_c, log_tiny)
        probs_log = jnp.where(is_peak, lo, log_tiny)
        shifted = pltpu.roll(probs_log, P - spw, 1)
        uv = jnp.log(1.0 - p_voiced + TINY)
        out = jnp.where(lane == n_bins, uv, shifted)
        out_ref[:, :] = jnp.where(lane <= n_bins, out, jnp.float32(NEG_PAD))

    # window-max via pl.roll with 2-D ops (axis 1)
    for rows in (512, 1024, 2048, 4096):
        dt_c = timed(build2d(copy2d, rows), params, flat)
        dt_d = timed(build2d(direct2d, rows), params, flat)
        print(f"rows={rows:5d}  copy2d {dt_c:7.2f} ms   direct2d {dt_d:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
