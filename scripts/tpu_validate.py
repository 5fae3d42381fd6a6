"""On-chip kernel validation across the real family configurations.

Runs on actual TPU hardware (the CI suite runs CPU interpret mode; the
driver runs bench.py). Checks, for each family's state count and band
width, that the Pallas decoders produce bit-identical paths to the NumPy
oracle, and that the banded fast path matches the dense kernel exactly.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_validate.py
"""

import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vspl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viterbi_spl_tpu.hmm import params as P
    from viterbi_spl_tpu.hmm.oracle import viterbi_oracle
    from viterbi_spl_tpu.hmm.viterbi_banded import extract_banded_structure
    from viterbi_spl_tpu.hmm.viterbi_pallas import viterbi_decode_batch_pallas

    assert jax.default_backend() == "tpu", "run this on the TPU"
    rng = np.random.default_rng(0)
    failures = 0

    configs = [
        ("dcnet/msnet 320 bins, d_max 12", 320, 12, 6),
        ("ftanet 320 bins, d_max 14", 320, 14, 2),
        ("tonet 360 bins, d_max 14", 360, 14, 2),
        ("jdc 721 bins, d_max 40", 721, 40, 2),
    ]
    for name, n_bins, d_max, floor in configs:
        qt = [np.clip(n_bins // 2 + np.cumsum(rng.integers(-3, 4, 4000)), 0, n_bins - 1)]
        stats = P.count_statistics(qt, n_bins)
        A = P.shape_transition_matrix(
            stats.transition_counts, np.array([[0.98, 0.02], [0.02, 0.98]]),
            n_bins, d_max, floor,
        )
        pi = P.shape_init_probs(stats.p_steady, p_th=1e-4)
        S = n_bins + 1
        bs = extract_banded_structure(A, ((S + 127) // 128) * 128)

        tracks, expected = [], []
        for T in (257, 400):
            path = np.clip(
                n_bins // 2 + np.cumsum(rng.integers(-2, 3, T)), 0, n_bins - 1
            )
            obs = np.full((S, T), 1e-4, np.float32)
            obs[path, np.arange(T)] = 1.0
            obs[n_bins, ::9] = 0.7
            obs /= obs.sum(0, keepdims=True)
            tracks.append(obs)
            expected.append(
                viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
            )

        for allow_banded in (False, True) if bs is not None else (False,):
            t0 = time.time()
            got = viterbi_decode_batch_pallas(
                transition_matrix=A, prob_init=pi, probs_st_list=tracks,
                interpret=False, allow_banded=allow_banded,
            )
            ok = all(np.array_equal(e, g) for e, g in zip(expected, got))
            kind = "banded" if (allow_banded and bs is not None) else "dense"
            print(f"{name} [{kind}]: {'OK' if ok else 'MISMATCH'} "
                  f"({time.time()-t0:.1f}s)", flush=True)
            failures += 0 if ok else 1

    # imm analytic (dense) matrix
    A = P.imm_transition_matrix(20, 721)
    pi = np.full(722, 1.0 / 722)
    obs = rng.random((722, 300)).astype(np.float32) ** 6
    obs /= obs.sum(0, keepdims=True)
    expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
    got = viterbi_decode_batch_pallas(
        transition_matrix=A, prob_init=pi, probs_st_list=[obs], interpret=False
    )[0]
    ok = np.array_equal(expected, got)
    print(f"imm analytic 722 bins [dense]: {'OK' if ok else 'MISMATCH'}", flush=True)
    failures += 0 if ok else 1

    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
