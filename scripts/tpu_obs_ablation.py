"""Vreg-level cost account of the fused shaun observation kernel.

Times kernel variants with individual stages removed (same block shapes,
same HBM traffic) to attribute the 35 ms (N=128, T=8192, P=384) between:
  - HBM round trip (copy variant = floor),
  - the windowed-max lane rolls,
  - the exp over all P lanes (softmax numerator + denominator),
  - the final log over all P lanes,
  - the lane reductions (gmax, denom),
plus the direct-log candidate (peak lanes get (x-gmax) + log(c) with a
log-TINY floor instead of the P-lane log; exp stays for the denominator).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_obs_ablation.py
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
        shaun_log_obs_pallas,
    )
    from viterbi_spl_tpu.hmm.viterbi import NEG_PAD, TINY

    assert jax.default_backend() == "tpu"

    N, T, n_bins, P, spw = 128, 1 << 13, 360, 384, 5
    BLOCK = 32
    raw = jax.random.normal(jax.random.PRNGKey(2), (N, T, n_bins),
                            jnp.float32) - 2.0
    padded = jnp.asarray(
        pad_logits_reflect(raw, spw, P)
    ).block_until_ready()
    params = jnp.asarray([0.0, np.log(0.8 / 0.2), 2.0], jnp.float32)

    def timed(fn, *args, iters=8):
        _ = float(jnp.sum(fn(*args)[:, -1]))
        t0 = time.perf_counter()
        sums = [jnp.sum(fn(*args)[:, -1]) for _ in range(iters)]
        _ = float(sum(sums))
        return (time.perf_counter() - t0) / iters * 1e3

    def build(body, block=BLOCK):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T // block,),
            in_specs=[pl.BlockSpec((N, block, P), lambda i, *_: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((N, block, P), lambda i, *_: (0, i, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[],
        )
        call = pl.pallas_call(
            body, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((N, T, P), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )

        @jax.jit
        def run(pm, lg):
            return call(pm, lg)[0]

        return run

    def make_variant(rolls=True, use_exp=True, use_log=True,
                     reductions=True, direct_log=False):
        def kernel(params_ref, logits_ref, out_ref):
            th, offset, scale = params_ref[0], params_ref[1], params_ref[2]
            x = logits_ref[:, :, :]
            _, L, _ = x.shape
            lane = jax.lax.broadcasted_iota(jnp.int32, (N, L, P), 2)
            data = jnp.logical_and(lane >= spw, lane < spw + n_bins)

            if rolls:
                left = pltpu.roll(_window_max(x, spw, P, neg=False), 1, 2)
                right = pltpu.roll(_window_max(x, spw, P, neg=True), P - 1, 2)
                is_peak = jnp.logical_and(
                    data, jnp.logical_and(x > left, x >= right))
            else:
                is_peak = data

            peak_vals = jnp.where(is_peak, x, NEG_PAD)
            if reductions:
                gmax = jnp.max(peak_vals, axis=2, keepdims=True)
            else:
                gmax = peak_vals[:, :, :1] * 0.0
            any_peak = gmax > jnp.float32(NEG_PAD) / 2

            sign = jnp.where(gmax >= th, 1.0, -1.0).astype(jnp.float32)
            s = scale * (gmax - th) + sign * offset
            p_voiced = jax.nn.sigmoid(s)
            p_voiced = jnp.where(any_peak, p_voiced, 0.0)

            d = x - gmax
            if use_exp:
                exps = jnp.where(is_peak, jnp.exp(d), 0.0)
            else:
                exps = jnp.where(is_peak, d * 0.125 + 1.0, 0.0)
            if reductions:
                denom = jnp.sum(exps, axis=2, keepdims=True)
            else:
                denom = exps[:, :, :1] + 1.0

            if direct_log:
                # log c on [N, L, 1]; peak lanes get d + log_c floored at
                # log(TINY); non-peak lanes exactly log(TINY)
                log_c = jnp.log(p_voiced + TINY) - jnp.log(
                    jnp.maximum(denom, 1e-30))
                log_tiny = jnp.float32(np.log(TINY))
                lo = jnp.maximum(d + log_c, log_tiny)
                probs_log = jnp.where(is_peak, lo, log_tiny)
                shifted = pltpu.roll(probs_log, P - spw, 2)
                uv = jnp.log(1.0 - p_voiced + TINY)
                out = jnp.where(lane == n_bins, uv, shifted)
                out_ref[:, :, :] = jnp.where(
                    lane <= n_bins, out, jnp.float32(NEG_PAD))
                return

            voiced = exps * (p_voiced / jnp.maximum(denom, 1e-30))
            probs = pltpu.roll(voiced, P - spw, 2)
            probs = jnp.where(lane == n_bins, 1.0 - p_voiced, probs)
            probs = jnp.where(lane <= n_bins, probs, 0.0)
            if use_log:
                log_obs = jnp.log(probs + TINY)
            else:
                log_obs = probs * 0.5 - 40.0
            out_ref[:, :, :] = jnp.where(
                lane <= n_bins, log_obs, jnp.float32(NEG_PAD))

        return kernel

    def copy_kernel(params_ref, logits_ref, out_ref):
        out_ref[:, :, :] = logits_ref[:, :, :] * params_ref[2]

    variants = [
        ("production", None),
        ("full (rebuilt)", make_variant()),
        ("copy (HBM floor)", copy_kernel),
        ("no rolls", make_variant(rolls=False)),
        ("no exp", make_variant(use_exp=False)),
        ("no log", make_variant(use_log=False)),
        ("no exp+log", make_variant(use_exp=False, use_log=False)),
        ("no reductions", make_variant(reductions=False)),
        ("direct-log", make_variant(direct_log=True)),
    ]

    results = {}
    for name, body in variants:
        if body is None:
            dt = timed(
                lambda pl_in: shaun_log_obs_pallas(
                    pl_in, n_bins, spw, 0.0, block_frames=BLOCK,
                    interpret=False),
                padded,
            )
        else:
            dt = timed(build(body), params, padded)
        results[name] = dt
        print(f"{name:20s} {dt:8.2f} ms", flush=True)

    # value check of the direct-log candidate vs production
    ref = shaun_log_obs_pallas(padded[:8, :256], n_bins, spw, 0.0,
                               block_frames=BLOCK, interpret=False)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(256 // BLOCK,),
        in_specs=[pl.BlockSpec((8, BLOCK, P), lambda i, *_: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((8, BLOCK, P), lambda i, *_: (0, i, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[],
    )

    def _make_direct8():
        def kernel(params_ref, logits_ref, out_ref):
            th, offset, scale = params_ref[0], params_ref[1], params_ref[2]
            x = logits_ref[:, :, :]
            _, L, _ = x.shape
            lane = jax.lax.broadcasted_iota(jnp.int32, (8, L, P), 2)
            data = jnp.logical_and(lane >= spw, lane < spw + n_bins)
            left = pltpu.roll(_window_max(x, spw, P, neg=False), 1, 2)
            right = pltpu.roll(_window_max(x, spw, P, neg=True), P - 1, 2)
            is_peak = jnp.logical_and(
                data, jnp.logical_and(x > left, x >= right))
            peak_vals = jnp.where(is_peak, x, NEG_PAD)
            gmax = jnp.max(peak_vals, axis=2, keepdims=True)
            any_peak = gmax > jnp.float32(NEG_PAD) / 2
            sign = jnp.where(gmax >= th, 1.0, -1.0).astype(jnp.float32)
            s = scale * (gmax - th) + sign * offset
            p_voiced = jnp.where(any_peak, jax.nn.sigmoid(s), 0.0)
            d = x - gmax
            exps = jnp.where(is_peak, jnp.exp(d), 0.0)
            denom = jnp.sum(exps, axis=2, keepdims=True)
            log_c = jnp.log(p_voiced + TINY) - jnp.log(
                jnp.maximum(denom, 1e-30))
            log_tiny = jnp.float32(np.log(TINY))
            lo = jnp.maximum(d + log_c, log_tiny)
            probs_log = jnp.where(is_peak, lo, log_tiny)
            shifted = pltpu.roll(probs_log, P - spw, 2)
            uv = jnp.log(1.0 - p_voiced + TINY)
            out = jnp.where(lane == n_bins, uv, shifted)
            out_ref[:, :, :] = jnp.where(
                lane <= n_bins, out, jnp.float32(NEG_PAD))
        return kernel

    call8 = pl.pallas_call(
        _make_direct8(), grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8, 256, P), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )
    got = jax.jit(lambda pm, lg: call8(pm, lg)[0])(params, padded[:8, :256])
    ref_np, got_np = np.asarray(ref), np.asarray(got)
    mask = ref_np > -80.0  # away from the TINY floor
    rel = np.abs(got_np - ref_np) / np.maximum(np.abs(ref_np), 1e-3)
    print(f"direct-log vs production: max rel diff (log-prob > -80): "
          f"{rel[mask].max():.3e}; floor-region max abs diff: "
          f"{np.abs(got_np - ref_np)[~mask].max():.3e}")


if __name__ == "__main__":
    main()
