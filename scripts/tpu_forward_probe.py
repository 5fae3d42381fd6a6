"""Isolate cost drivers of the banded forward kernel on-chip.

Compiles the v3 kernel with fabricated (groups, singles) configurations to
split per-frame cost into: fixed overhead (staging/stores/reduce), the
grouped window maxes, and the individual roll+add candidates.
Timing values are NOT decodes (fabricated configs change semantics) —
throughput math only.
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
    _build_banded_call,
    extract_banded_structure,
)


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
    band_d = jnp.asarray(bs.band)
    bv_d = jnp.asarray(bs.bv)
    bv1 = jnp.zeros((1, P), jnp.float32)

    key = jax.random.PRNGKey(0)
    log_obs = jax.random.uniform(key, (N, T, P), jnp.float32, -20.0, 0.0)
    log_obs = jnp.where(
        jnp.arange(P)[None, None, :] < S, log_obs, jnp.float32(-1e30)
    ).block_until_ready()
    lens = jnp.full((N,), T, jnp.int32)

    base = (bs.d_max, bs.n_bins, bs.S, bs.P,
            bs.log_c_uv, bs.log_c_vu, bs.log_c_uu)
    variants = {
        "empty (overhead)": ((), (), bv1),
        "groups only": (bs.groups, (), bv_d),
        "singles only (7 mid)": ((), bs.singles, bv1),
        "full v3": (bs.groups, bs.singles, bv_d),
        "all 29 singles": ((), tuple(range(-bs.d_max, bs.d_max + 1)), bv1),
    }
    for name, (groups, singles, bv) in variants.items():
        run = _build_banded_call(base + (groups, singles), N, T, BLOCK, False)
        fn = lambda: run(lens, log_obs, band_d, bv, log_pi_d)[1]
        _ = int(jnp.sum(fn()))
        t0 = time.perf_counter()
        for _ in range(5):
            _ = int(jnp.sum(fn()))
        dt = (time.perf_counter() - t0) / 5
        print(f"{name:24s} {dt*1e3:8.2f} ms  ({N*T/dt/1e6:.1f} M frames/s)")


if __name__ == "__main__":
    main()
