"""Fused Pallas observation kernel vs the XLA implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from viterbi_spl_tpu.hmm.obs import shaun_observation_probs
from viterbi_spl_tpu.hmm.obs_pallas import (
    pad_logits_reflect,
    shaun_log_obs_pallas,
)
from viterbi_spl_tpu.hmm.viterbi import NEG_PAD, TINY


def reference_log_obs(logits, th, spw, n_bins, P):
    obs = np.asarray(shaun_observation_probs(jnp.asarray(logits), th, spw))
    log_obs = np.log(obs + TINY)
    out = np.full((logits.shape[0], P), NEG_PAD, np.float32)
    out[:, : n_bins + 1] = log_obs
    return out


@pytest.mark.parametrize(
    "n_bins,spw,P,N,T",
    [
        (360, 5, 384, 8, 64),   # tonet config
        (721, 16, 768, 8, 32),  # jdc config (20+721+20 fits 768 for imm too)
    ],
    ids=["tonet-360", "jdc-721"],
)
def test_fused_obs_matches_xla_path(rng, n_bins, spw, P, N, T):
    th = 0.3
    logits = rng.normal(-2, 1, (N, T, n_bins)).astype(np.float32)
    logits[0, :, :] = rng.integers(0, 3, (T, n_bins))  # tie-heavy track

    padded = pad_logits_reflect(jnp.asarray(logits), spw, P)
    got = np.asarray(
        shaun_log_obs_pallas(padded, n_bins, spw, th, block_frames=16)
    )
    log_tiny = np.float32(np.log(np.float32(TINY)))
    for i in range(N):
        want = reference_log_obs(logits[i], th, spw, n_bins, P)
        # documented contract (direct-log kernel): away from the TINY
        # floor, equal up to the peak-softmax denominator's reduction
        # order + log-rearrangement ulp ...
        away = want > -80.0
        np.testing.assert_allclose(
            got[i][away], want[away], rtol=2e-4, atol=0
        )
        # ... the unvoiced lane keeps the exact arithmetic ...
        np.testing.assert_allclose(
            got[i][:, n_bins], want[:, n_bins], rtol=1e-6
        )
        # ... inside the floor region (excluding NEG_PAD padding lanes),
        # values floor at log(TINY) with at most log 2 absolute deviation
        floor = (~away) & (want > np.float32(NEG_PAD) / 2)
        assert np.all(got[i][floor] >= log_tiny - 1e-4)
        assert np.all(np.abs(got[i][floor] - want[floor]) <= 0.70)
        # ... and exact zeros (non-peaks, padding) are BIT-exact
        zero = want <= log_tiny + 1e-3
        np.testing.assert_array_equal(got[i][zero], want[zero])


def test_fused_obs_feeds_forward_kernel(rng):
    """Fused obs output decodes identically to the two-step path when fed
    to the same decoder (same obs values -> same path)."""
    from viterbi_spl_tpu.hmm import params as hmm_params
    from viterbi_spl_tpu.hmm.viterbi import prepare_log_params
    from viterbi_spl_tpu.hmm.viterbi_banded import (
        extract_banded_structure,
        viterbi_forward_pallas_banded_batch,
    )
    from viterbi_spl_tpu.hmm.viterbi_pallas import (
        viterbi_backtrace_pallas_batch,
    )

    n_bins, spw, P = 60, 3, 128
    N, T = 8, 32
    q = np.clip(30 + np.cumsum(rng.integers(-2, 3, 2000)), 0, n_bins - 1)
    voiced = np.repeat(rng.random(101) > 0.3, 20)[:2000]
    q = np.where(voiced, q, n_bins)
    stats = hmm_params.count_statistics([q], n_bins)
    A = hmm_params.shape_transition_matrix(
        stats.transition_counts, stats.switch, n_bins, 6, floor=2
    )
    pi = hmm_params.shape_init_probs(stats.p_steady)
    log_B, log_pi = prepare_log_params(A, pi, pad_to=P)
    bs = extract_banded_structure(A, P)

    logits = rng.normal(-2, 1, (N, T, n_bins)).astype(np.float32)
    path = np.clip(
        n_bins // 2 + np.cumsum(rng.integers(-2, 3, (N, T)), axis=1),
        0, n_bins - 1,
    )
    for i in range(N):
        logits[i, np.arange(T), path[i]] += 6.0

    padded = pad_logits_reflect(jnp.asarray(logits), spw, P)
    log_obs = shaun_log_obs_pallas(padded, n_bins, spw, 0.0, block_frames=16)
    lens = jnp.full((N,), T, jnp.int32)
    t1, t1m1 = viterbi_forward_pallas_banded_batch(
        bs, jnp.asarray(log_pi), log_obs, lens, block_frames=16
    )
    last = np.argmax(np.asarray(t1)[:, : n_bins + 1], axis=1).astype(np.int32)
    states = viterbi_backtrace_pallas_batch(
        t1m1, jnp.asarray(log_B), last, lens, block_frames=16
    )
    # two-step path
    for i in range(N):
        obs = np.asarray(
            shaun_observation_probs(jnp.asarray(logits[i]), 0.0, spw)
        )
        lo = np.full((T, P), NEG_PAD, np.float32)
        lo[:, : n_bins + 1] = np.log(obs + TINY)
        away = lo > -80.0
        np.testing.assert_allclose(
            np.asarray(log_obs)[i][away], lo[away], rtol=2e-4, atol=0
        )
        # decoded mostly on the planted path
        assert (np.asarray(states)[i, :T] == path[i]).mean() > 0.9


def test_decoder_setup_fused_obs(rng, tmp_path):
    """DecoderSetup(fused_obs=True) decodes the same paths as the default
    path on smooth (tie-free) data."""
    import dataclasses

    from viterbi_spl_tpu.hmm import params as hmm_params
    from viterbi_spl_tpu.harness.evaluate import DecoderSetup

    n_bins, spw = 60, 3
    q = np.clip(30 + np.cumsum(rng.integers(-2, 3, 2000)), 0, n_bins - 1)
    voiced = np.repeat(rng.random(101) > 0.3, 20)[:2000]
    q = np.where(voiced, q, n_bins)
    stats = hmm_params.count_statistics([q], n_bins)
    A = hmm_params.shape_transition_matrix(
        stats.transition_counts, stats.switch, n_bins, 6, floor=2
    )
    pi = hmm_params.shape_init_probs(stats.p_steady)
    setup = DecoderSetup(
        transition_matrix=A, init_probs=pi, n_bins=n_bins, note_min=36.0,
        bins_per_semitone=2.0, spw=spw, voicing_threshold=0.5,
        hop_seconds=0.01, method="shaun",
    )
    fused = dataclasses.replace(setup, fused_obs=True)

    logits_list = []
    for T in (50, 77):
        lg = rng.normal(-2, 1, (T, n_bins)).astype(np.float32)
        path = np.clip(30 + np.cumsum(rng.integers(-1, 2, T)), 0, n_bins - 1)
        lg[np.arange(T), path] += 6.0
        logits_list.append(lg)

    base = setup.decode_batch(logits_list)
    fast = fused.decode_batch(logits_list)
    for (v0, b0), (v1, b1) in zip(base, fast):
        np.testing.assert_array_equal(v0, v1)
        np.testing.assert_array_equal(b0, b1)


@pytest.mark.parametrize("scaled", [True, False], ids=["scaled", "unscaled"])
@pytest.mark.parametrize(
    "n_bins,spw,P,N,T",
    [
        (360, 5, 384, 8, 64),   # tonet config
        (721, 16, 768, 8, 32),  # jdc config
    ],
    ids=["tonet-360", "jdc-721"],
)
def test_fused_softmax_obs_matches_xla_path(rng, scaled, n_bins, spw, P, N, T):
    from viterbi_spl_tpu.hmm.obs import softmax_observation_probs
    from viterbi_spl_tpu.hmm.obs_pallas import softmax_log_obs_pallas

    vth = 0.7  # threshold logit (the constant non-melody logit)
    pri = rng.random(n_bins + 1).astype(np.float32) + 0.1
    pri /= pri.sum()
    logits = rng.normal(-2, 1, (N, T, n_bins)).astype(np.float32)
    logits[0, :, :] = rng.integers(0, 3, (T, n_bins))  # tie-heavy track
    logits[1, 3, :] = -np.arange(n_bins)  # a frame with its peak at bin 0

    padded = pad_logits_reflect(jnp.asarray(logits), spw, P)
    got = np.asarray(
        softmax_log_obs_pallas(
            padded, n_bins, spw, vth, pri, scaled, block_frames=16
        )
    )
    for i in range(N):
        obs = np.asarray(
            softmax_observation_probs(
                jnp.asarray(logits[i]), vth, jnp.asarray(pri), spw, scaled
            )
        )
        want = np.full((T, P), NEG_PAD, np.float32)
        want[:, : n_bins + 1] = np.log(obs + TINY)
        # same tolerance contract as the shaun kernel (direct-log): tight
        # relative away from the TINY floor ...
        log_tiny = np.float32(np.log(np.float32(TINY)))
        away = want > -80.0
        np.testing.assert_allclose(
            got[i][away], want[away], rtol=2e-4, atol=0
        )
        # ... bounded absolute inside it (excluding NEG_PAD padding) ...
        floor = (~away) & (want > np.float32(NEG_PAD) / 2)
        assert np.all(got[i][floor] >= log_tiny - 1e-4)
        assert np.all(np.abs(got[i][floor] - want[floor]) <= 0.70)
        # ... and exact zeros (non-peaks, padding) BIT-exact
        zero = want <= log_tiny + 1e-3
        np.testing.assert_array_equal(got[i][zero], want[zero])


@pytest.mark.parametrize(
    "method", ["softmax-scaled", "softmax-unscaled"],
)
def test_decoder_setup_fused_obs_softmax(rng, method):
    """DecoderSetup(fused_obs=True) with the softmax methods decodes the
    same paths as the default path on smooth (tie-free) data."""
    import dataclasses

    from viterbi_spl_tpu.hmm import params as hmm_params
    from viterbi_spl_tpu.harness.evaluate import DecoderSetup

    n_bins, spw = 60, 3
    q = np.clip(30 + np.cumsum(rng.integers(-2, 3, 2000)), 0, n_bins - 1)
    voiced = np.repeat(rng.random(101) > 0.3, 20)[:2000]
    q = np.where(voiced, q, n_bins)
    stats = hmm_params.count_statistics([q], n_bins)
    A = hmm_params.shape_transition_matrix(
        stats.transition_counts, stats.switch, n_bins, 6, floor=2
    )
    pi = hmm_params.shape_init_probs(stats.p_steady)
    setup = DecoderSetup(
        transition_matrix=A, init_probs=pi, n_bins=n_bins, note_min=36.0,
        bins_per_semitone=2.0, spw=spw, voicing_threshold=0.5,
        hop_seconds=0.01, method=method,
    )
    fused = dataclasses.replace(setup, fused_obs=True)

    logits_list = []
    for T in (50, 77):
        lg = rng.normal(-2, 1, (T, n_bins)).astype(np.float32)
        path = np.clip(30 + np.cumsum(rng.integers(-1, 2, T)), 0, n_bins - 1)
        lg[np.arange(T), path] += 6.0
        logits_list.append(lg)

    base = setup.decode_batch(logits_list)
    fast = fused.decode_batch(logits_list)
    for (v0, b0), (v1, b1) in zip(base, fast):
        np.testing.assert_array_equal(v0, v1)
        np.testing.assert_array_equal(b0, b1)


@pytest.mark.parametrize(
    "method", ["shaun", "softmax-scaled", "softmax-unscaled"],
)
def test_fused_forward_equals_two_step(rng, method):
    """viterbi_forward_pallas_banded_batch_obs (observation model computed
    INSIDE the forward kernel) produces bit-identical T1/t1m1 to the
    two-kernel chain (standalone obs kernel -> forward), for all three
    observation methods, full-length and ragged batches."""
    import jax.numpy as jnp

    from viterbi_spl_tpu.hmm import params as hmm_params
    from viterbi_spl_tpu.hmm.obs_pallas import (
        softmax_log_obs_pallas,
    )
    from viterbi_spl_tpu.hmm.viterbi import prepare_log_params
    from viterbi_spl_tpu.hmm.viterbi_banded import (
        extract_banded_structure,
        viterbi_forward_pallas_banded_batch,
        viterbi_forward_pallas_banded_batch_obs,
    )

    n_bins, spw, P = 60, 3, 128
    N, T = 8, 32
    q = np.clip(30 + np.cumsum(rng.integers(-2, 3, 2000)), 0, n_bins - 1)
    voiced = np.repeat(rng.random(101) > 0.3, 20)[:2000]
    q = np.where(voiced, q, n_bins)
    stats = hmm_params.count_statistics([q], n_bins)
    A = hmm_params.shape_transition_matrix(
        stats.transition_counts, stats.switch, n_bins, 6, floor=2
    )
    pi = hmm_params.shape_init_probs(stats.p_steady)
    _, log_pi = prepare_log_params(A, pi, pad_to=P)
    bs = extract_banded_structure(A, P)

    logits = rng.normal(-2, 1, (N, T, n_bins)).astype(np.float32)
    padded = pad_logits_reflect(jnp.asarray(logits), spw, P)

    pri = (rng.random(n_bins + 1).astype(np.float32) + 0.1)
    pri /= pri.sum()
    th = 0.2
    if method == "shaun":
        log_obs = shaun_log_obs_pallas(
            padded, n_bins, spw, th, block_frames=16
        )
        obs_cfg = dict(method="shaun", spw=spw, threshold_logit=th)
    else:
        scaled = method == "softmax-scaled"
        log_obs = softmax_log_obs_pallas(
            padded, n_bins, spw, th, pri, scaled, block_frames=16
        )
        obs_cfg = dict(method=method, spw=spw, threshold_logit=th,
                       init_probs=pri)

    for lens in (np.full(N, T, np.int32),
                 np.asarray([T, T - 5, T - 1, 7, T, 3, T - 2, T], np.int32)):
        t1_a, t1m1_a = viterbi_forward_pallas_banded_batch(
            bs, jnp.asarray(log_pi), log_obs, jnp.asarray(lens),
            block_frames=16,
        )
        t1_b, t1m1_b = viterbi_forward_pallas_banded_batch_obs(
            bs, jnp.asarray(log_pi), padded, jnp.asarray(lens), obs_cfg,
            block_frames=16,
        )
        np.testing.assert_array_equal(np.asarray(t1_a), np.asarray(t1_b))
        np.testing.assert_array_equal(
            np.asarray(t1m1_a), np.asarray(t1m1_b)
        )
