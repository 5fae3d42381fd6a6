"""Fixed-lag streaming decoder tests."""

import numpy as np
import pytest

from conftest import random_hmm
from viterbi_spl_tpu.hmm.oracle import viterbi_oracle
from viterbi_spl_tpu.hmm.streaming import StreamingViterbi


def test_large_lag_equals_offline(rng):
    S, T = 40, 120
    A, pi, obs = random_hmm(rng, S, T)
    expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)

    sv = StreamingViterbi(A, pi, lag=T + 10)
    chunks = np.split(obs.T, [13, 50, 51, 100])  # ragged chunking
    out = [sv.push(c) for c in chunks if len(c)]
    out.append(sv.flush())
    got = np.concatenate(out)
    assert len(got) == T
    np.testing.assert_array_equal(expected, got)


def test_emission_cadence(rng):
    S, T = 20, 100
    A, pi, obs = random_hmm(rng, S, T)
    sv = StreamingViterbi(A, pi, lag=30)
    emitted = 0
    for i in range(0, T, 10):
        out = sv.push(obs.T[i : i + 10])
        emitted += len(out)
        # never emits frames within the lag window
        assert emitted <= max(0, (i + 10) - 30)
    emitted += len(sv.flush())
    assert emitted == T


def test_small_lag_agreement_on_melody_hmm(rng):
    from viterbi_spl_tpu.hmm import params as P

    n_bins = 50
    q = [np.clip(25 + np.cumsum(rng.integers(-2, 3, 1500)), 0, n_bins - 1)]
    stats = P.count_statistics(q, n_bins)
    A = P.shape_transition_matrix(
        stats.transition_counts, np.array([[0.97, 0.03], [0.04, 0.96]]),
        n_bins, 5, 2,
    )
    pi = P.shape_init_probs(stats.p_steady)
    T = 600
    path = np.clip(25 + np.cumsum(rng.integers(-1, 2, T)), 0, n_bins - 1)
    obs = np.full((n_bins + 1, T), 1e-3, np.float32)
    obs[path, np.arange(T)] = 1.0
    obs /= obs.sum(0, keepdims=True)
    expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)

    sv = StreamingViterbi(A, pi, lag=64)
    out = [sv.push(obs.T[i : i + 37]) for i in range(0, T, 37)]
    out.append(sv.flush())
    got = np.concatenate(out)
    assert len(got) == T
    agreement = float(np.mean(got == expected))
    assert agreement > 0.97, f"fixed-lag agreement only {agreement:.3f}"


def test_single_frame_pushes(rng):
    S, T = 15, 40
    A, pi, obs = random_hmm(rng, S, T)
    expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
    sv = StreamingViterbi(A, pi, lag=T)
    out = [sv.push(obs.T[i : i + 1]) for i in range(T)]
    out.append(sv.flush())
    got = np.concatenate(out)
    np.testing.assert_array_equal(expected, got)


def test_batched_streams_bitwise_equal_single_stream(rng):
    """StreamingViterbiBatch must reproduce StreamingViterbi per stream
    bitwise (the vmap computes the same f32 ops lane-wise), including at a
    finite lag, synchronized chunked pushes, and the flush tail."""
    from viterbi_spl_tpu.hmm.streaming import StreamingViterbiBatch

    S, T, M, lag, hop = 30, 90, 4, 25, 10
    tracks = [random_hmm(rng, S, T) for _ in range(M)]
    A, pi, _ = tracks[0]
    obs_batch = np.stack([np.asarray(o.T) for (_, _, o) in
                          [(A, pi, t[2]) for t in tracks]])
    # decode each stream with the single-stream class (shared HMM params)
    singles = []
    for m in range(M):
        sv = StreamingViterbi(A, pi, lag=lag)
        outs = [sv.push(obs_batch[m, i : i + hop]) for i in range(0, T, hop)]
        outs.append(sv.flush())
        singles.append(np.concatenate(outs))

    svb = StreamingViterbiBatch(A, pi, n_streams=M, lag=lag)
    outs = [svb.push(obs_batch[:, i : i + hop]) for i in range(0, T, hop)]
    outs.append(svb.flush())
    got = np.concatenate([o for o in outs if o.shape[1]], axis=1)
    assert got.shape == (M, T)
    for m in range(M):
        np.testing.assert_array_equal(got[m], singles[m])


def test_batched_streams_kernel_path_bitwise_equal_scan_path(rng):
    """M=8 routes through the production Pallas kernels (interpret mode on
    CPU) with exact carry injection; decisions must be bitwise equal to the
    vmapped-scan path, on a banded melody HMM AND a dense random one, at a
    finite lag with the flush tail."""
    from viterbi_spl_tpu.hmm import params as P
    from viterbi_spl_tpu.hmm.streaming import StreamingViterbiBatch

    M, T, lag, hop = 8, 96, 30, 16
    n_bins = 40
    tracks = [np.clip(20 + np.cumsum(rng.integers(-2, 3, 1500)), 0, n_bins - 1)]
    stats = P.count_statistics(tracks, n_bins)
    A_banded = P.shape_transition_matrix(
        stats.transition_counts, np.array([[0.98, 0.02], [0.02, 0.98]]),
        n_bins, 5, floor=2,
    )
    pi_banded = P.shape_init_probs(stats.p_steady, p_th=1e-4)
    A_dense, pi_dense, _ = random_hmm(rng, n_bins + 1, 4)

    for A, pi in ((A_banded, pi_banded), (A_dense, pi_dense)):
        S = A.shape[0]
        obs_batch = np.stack(
            [random_hmm(rng, S, T)[2].T for _ in range(M)]
        ).astype(np.float32)
        outs = {}
        for kernels in (False, True):
            svb = StreamingViterbiBatch(
                A, pi, n_streams=M, lag=lag, use_kernels=kernels
            )
            got = [svb.push(obs_batch[:, i : i + hop])
                   for i in range(0, T, hop)]
            got.append(svb.flush())
            outs[kernels] = np.concatenate(
                [o for o in got if o.shape[1]], axis=1
            )
            assert outs[kernels].shape == (M, T)
        np.testing.assert_array_equal(outs[True], outs[False])


def test_batched_streams_large_lag_equals_offline(rng):
    from viterbi_spl_tpu.hmm.streaming import StreamingViterbiBatch

    S, T, M = 25, 70, 3
    A, pi, _ = random_hmm(rng, S, T)
    obs_list = [random_hmm(rng, S, T)[2] for _ in range(M)]
    obs_batch = np.stack([o.T for o in obs_list])
    svb = StreamingViterbiBatch(A, pi, n_streams=M, lag=T + 5)
    out = svb.push(obs_batch)
    assert out.shape == (M, 0)
    got = svb.flush()
    for m in range(M):
        expected = viterbi_oracle(
            transition_matrix=A, prob_init=pi, probs_st=obs_list[m]
        )
        np.testing.assert_array_equal(expected, got[m])


def test_streaming_drain_amortized_readback_identical(rng):
    """StreamingDrain (the amortized host drain) must emit exactly the
    per-push pool's state sequences — it only batches readbacks (one
    device-side concat + one transfer per `every` pushes), never changes
    the DP — including when drain boundaries straddle the pre-lag phase
    and the flush tail, and on both the scan and kernel paths."""
    from viterbi_spl_tpu.hmm.streaming import (
        StreamingDrain,
        StreamingViterbiBatch,
    )

    S, T, M, lag, hop = 25, 140, 8, 33, 10
    obs_batch = np.stack(
        [random_hmm(rng, S, T)[2].T for _ in range(M)]
    ).astype(np.float32)
    A, pi, _ = random_hmm(rng, S, 4)

    for kernels in (False, True):
        ref_pool = StreamingViterbiBatch(
            A, pi, n_streams=M, lag=lag, use_kernels=kernels
        )
        ref = [ref_pool.push(obs_batch[:, i : i + hop])
               for i in range(0, T, hop)]
        ref.append(ref_pool.flush())
        ref = np.concatenate([o for o in ref if o.shape[1]], axis=1)

        for every in (1, 3, 8):
            drain = StreamingDrain(
                StreamingViterbiBatch(
                    A, pi, n_streams=M, lag=lag, use_kernels=kernels
                ),
                every=every,
            )
            got = [drain.push(obs_batch[:, i : i + hop])
                   for i in range(0, T, hop)]
            got.append(drain.flush())
            got = np.concatenate(
                [o for o in got if o is not None and o.shape[1]], axis=1
            )
            assert got.shape == (M, T), (kernels, every)
            np.testing.assert_array_equal(got, ref)
