"""On-chip IMM NMF benchmark (the reference's second hot loop,
imm/tf_imm.py:205-352: 100-iteration multiplicative IS updates on GPU).

Measures, on one TPU chip at the reference's mono configuration
(F=1025, U=721, R=40, P=30, K=10):

- per-iteration time of the jitted update sweep at N=8192 frames
  (~47 s of audio at hop 256/44.1 kHz), host-synced per iteration the way
  `IMM.fit` is (the patience check reads the IS divergence each iter),
- the same 10 iterations inside one `lax.fori_loop` jit (no host syncs),
  isolating the axon host round-trip overhead,
- projected wall time for a 100-iteration fit of a 4-minute track.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_imm_bench.py
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vspl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viterbi_spl_tpu.models.imm import IMM, IMMConfig

    N = 8192
    imm = IMM(IMMConfig())
    cfg = imm.config
    rng = np.random.default_rng(0)
    SX = jnp.asarray(rng.random((cfg.F, N)) + 1e-3, jnp.float32)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    HGAMMA = jnp.abs(jax.random.normal(ks[0], (cfg.P, cfg.K)))
    HPHI = jnp.abs(jax.random.normal(ks[1], (cfg.K, N)))
    HF0 = jnp.abs(jax.random.normal(ks[2], (cfg.U, N)))
    WM = jnp.abs(jax.random.normal(ks[3], (cfg.F, cfg.R)))
    HM = jnp.abs(jax.random.normal(ks[4], (cfg.R, N)))
    state = (HGAMMA, HPHI, HF0, WM, HM)

    # --- host-looped iterations (the fit() pattern: sync err each iter) ---
    st = state
    (st, aux, err) = imm._iter_fn(SX, *st)  # compile + warmup
    float(err)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        st, aux, err = imm._iter_fn(SX, *st)
        float(err)
    host_per_iter = (time.perf_counter() - t0) / iters

    # --- device-looped iterations (one jit, no host syncs) ---
    @jax.jit
    def ten_iters(SX, HGAMMA, HPHI, HF0, WM, HM):
        def body(_, carry):
            (HGAMMA, HPHI, HF0, WM, HM), err = carry
            new, _, err = imm._iteration(SX, HGAMMA, HPHI, HF0, WM, HM)
            return new, err

        (HGAMMA, HPHI, HF0, WM, HM), err = jax.lax.fori_loop(
            0, iters, body, ((HGAMMA, HPHI, HF0, WM, HM), jnp.float32(0))
        )
        return HGAMMA, HPHI, HF0, WM, HM, err

    out = ten_iters(SX, *state)
    float(out[-1])  # compile + warmup
    t0 = time.perf_counter()
    out = ten_iters(SX, *state)
    float(out[-1])
    dev_per_iter = (time.perf_counter() - t0) / iters

    # matmul FLOPs per iteration (the dominant terms, forward+update sweeps)
    # each WF0-sized product is F*U*N MACs; count the big ones per sweep
    big = 2 * cfg.F * cfg.U * N  # flops per WF0@HF0-scale matmul
    approx_flops = big * 6  # SF0 recomputes + PSX/QSX transposed products

    # --- the production fit (device-side patience while_loop) ---
    best_state, aux, err, it = imm._fit_fn(SX, *state, jnp.int32(N))  # compile + warmup
    float(err)
    t0 = time.perf_counter()
    best_state, aux, err, it = imm._fit_fn(SX, *state, jnp.int32(N))
    float(err)
    fit_s, fit_iters = time.perf_counter() - t0, int(it)

    track_4min_frames = int(4 * 60 * 44100 / 256)
    print(json.dumps({
        "config": {"F": cfg.F, "U": cfg.U, "R": cfg.R, "P": cfg.P,
                   "K": cfg.K, "frames": N},
        "host_synced_iter_ms": round(host_per_iter * 1e3, 2),
        "device_loop_iter_ms": round(dev_per_iter * 1e3, 2),
        "host_overhead_ms_per_iter": round((host_per_iter - dev_per_iter) * 1e3, 2),
        "approx_tflops_per_s": round(approx_flops / dev_per_iter / 1e12, 2),
        "fit_while_loop_s": round(fit_s, 3),
        "fit_iters_run": fit_iters,
        "fit_ms_per_iter": round(fit_s / max(fit_iters, 1) * 1e3, 2),
        "projected_100iter_fit_s_4min_track": round(
            100 * dev_per_iter * track_4min_frames / N, 1),
    }, indent=None), flush=True)


if __name__ == "__main__":
    main()
