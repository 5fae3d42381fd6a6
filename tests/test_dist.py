"""Sharded decoding tests on the 8-device CPU mesh.

The key property (mirroring the reference's own redundant-compute-and-trim
blocking, dcnet/nsgt.py:420-505): the halo-based time-block decode must
equal the single-device decode bit for bit on realistic banded-transition
HMMs, with the seam flags certifying convergence.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import random_hmm
from viterbi_spl_tpu.dist import (
    decode_tracks_sharded,
    make_mesh,
    viterbi_sharded_time_blocks,
)
from viterbi_spl_tpu.hmm import params as hmm_params
from viterbi_spl_tpu.hmm.oracle import viterbi_oracle
from viterbi_spl_tpu.hmm.viterbi import log_obs_fn, prepare_log_params


def realistic_hmm(rng, n_bins=60, T=512):
    """Banded transition + peaky observations, like the real melody HMMs."""
    tracks = [np.clip(30 + np.cumsum(rng.integers(-2, 3, 2000)), 0, n_bins - 1)]
    stats = hmm_params.count_statistics(tracks, n_bins)
    A = hmm_params.shape_transition_matrix(
        stats.transition_counts,
        np.array([[0.99, 0.01], [0.01, 0.99]]),
        n_bins,
        d_max=6,
        floor=2,
    )
    pi = hmm_params.shape_init_probs(stats.p_steady, p_th=1e-4)
    # peaky observations following a wandering pitch + unvoiced stretches
    path = np.clip(30 + np.cumsum(rng.integers(-1, 2, T)), 0, n_bins - 1)
    obs = np.full((n_bins + 1, T), 1e-4, np.float32)
    for t in range(T):
        if rng.random() < 0.1:
            obs[n_bins, t] = 0.9
        else:
            obs[path[t], t] = 0.8
            obs[(path[t] + 7) % n_bins, t] = 0.1
    obs /= obs.sum(axis=0, keepdims=True)
    return A, pi, obs


def test_decode_tracks_sharded_matches_oracle(rng):
    mesh = make_mesh(data=8, seq=1)
    S, T, N = 45, 64, 8
    A, pi, _ = random_hmm(rng, S, T)
    log_B, log_pi = prepare_log_params(A, pi)
    obs_list, expected = [], []
    for _ in range(N):
        _, _, obs = random_hmm(rng, S, T)
        obs_list.append(obs.T)
        expected.append(viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs))
    log_obs = log_obs_fn(jnp.asarray(np.stack(obs_list)))
    got = decode_tracks_sharded(
        jnp.asarray(log_B), jnp.asarray(log_pi), log_obs, mesh
    )
    np.testing.assert_array_equal(np.stack(expected), np.asarray(got))


def test_certified_time_sharded_decode_is_exact(rng):
    """The auto-halo certified decode must return the exact single-device
    path (doubling the halo until the seam certificate passes)."""
    from viterbi_spl_tpu.dist import viterbi_decode_time_sharded

    mesh = make_mesh(data=1, seq=8)
    for seed in (0, 1, 3):
        r = np.random.default_rng(seed)
        A, pi, obs = realistic_hmm(r, n_bins=60, T=1024)
        expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
        log_B, log_pi = prepare_log_params(A, pi)
        log_obs = log_obs_fn(jnp.asarray(obs.T))
        states, used_halo = viterbi_decode_time_sharded(
            jnp.asarray(log_B), jnp.asarray(log_pi), log_obs, mesh, halo=16
        )
        np.testing.assert_array_equal(expected, np.asarray(states))


def test_seam_certificate_catches_every_mismatch(rng):
    """Soundness sweep: whenever the sharded decode deviates from the
    single-device path, at least one seam flag must be False."""
    mesh = make_mesh(data=1, seq=8)
    for seed in range(4):
        r = np.random.default_rng(seed)
        A, pi, obs = realistic_hmm(r, n_bins=60, T=1024)
        expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
        log_B, log_pi = prepare_log_params(A, pi)
        log_obs = log_obs_fn(jnp.asarray(obs.T))
        for halo in (16, 48):
            states, seams = viterbi_sharded_time_blocks(
                jnp.asarray(log_B), jnp.asarray(log_pi), log_obs, mesh, halo=halo
            )
            ok = bool(np.all(np.asarray(seams)))
            match = np.array_equal(expected, np.asarray(states))
            assert match or not ok, f"false positive at seed={seed} halo={halo}"


def test_pallas_sharded_decode_matches_scan_variant(rng):
    """The Pallas-kernel sequence-parallel decode must agree with the scan
    variant and the oracle (interpret mode on the CPU mesh)."""
    from viterbi_spl_tpu.hmm.viterbi_pallas import LANE
    from viterbi_spl_tpu.hmm.viterbi import NEG_PAD
    from viterbi_spl_tpu.dist.sharded_viterbi import (
        viterbi_sharded_time_blocks_pallas,
    )

    mesh = make_mesh(data=1, seq=8)
    A, pi, obs = realistic_hmm(rng, n_bins=60, T=1024)
    S = A.shape[0]
    P = ((S + LANE - 1) // LANE) * LANE
    expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)

    log_B, log_pi = prepare_log_params(A, pi, pad_to=P)
    log_obs = np.full((obs.shape[1], P), NEG_PAD, np.float32)
    log_obs[:, :S] = np.asarray(log_obs_fn(jnp.asarray(obs.T)))

    states, seams = viterbi_sharded_time_blocks_pallas(
        jnp.asarray(log_B), jnp.asarray(log_pi), jnp.asarray(log_obs),
        mesh, halo=64, S=S,
    )
    np.testing.assert_array_equal(expected, np.asarray(states))

    # and the certificate must match the scan variant's flags exactly
    log_B_u, log_pi_u = prepare_log_params(A, pi)
    scan_states, scan_seams = viterbi_sharded_time_blocks(
        jnp.asarray(log_B_u), jnp.asarray(log_pi_u),
        log_obs_fn(jnp.asarray(obs.T)), mesh, halo=64,
    )
    np.testing.assert_array_equal(np.asarray(scan_states), np.asarray(states))
    np.testing.assert_array_equal(np.asarray(scan_seams), np.asarray(seams))


def test_forced_halo_doubling_episode():
    """The seam-stress fixture must make small halos FAIL their certificate
    (never silently return a wrong path) and drive the auto-halo wrapper
    through two real doubling episodes to the exact decode."""
    from viterbi_spl_tpu.dist import viterbi_decode_time_sharded
    from viterbi_spl_tpu.dist.certify import make_seam_stress_hmm
    from viterbi_spl_tpu.hmm.viterbi import (
        viterbi_backtrace_jax,
        viterbi_forward_jax,
    )

    mesh = make_mesh(data=1, seq=8)
    A, pi, obs, switch = make_seam_stress_hmm(n_blocks=8)
    log_B, log_pi = prepare_log_params(A, pi)
    log_obs = log_obs_fn(jnp.asarray(obs))
    t1_last, T2 = viterbi_forward_jax(
        jnp.asarray(log_B), jnp.asarray(log_pi), log_obs
    )
    exact = np.asarray(
        viterbi_backtrace_jax(T2, jnp.argmax(t1_last).astype(jnp.int32))
    )
    assert int(np.argmax(exact == 1)) == switch

    for halo, should_pass in ((16, False), (32, False), (64, True)):
        states, seams = viterbi_sharded_time_blocks(
            jnp.asarray(log_B), jnp.asarray(log_pi), log_obs, mesh, halo=halo
        )
        ok = bool(np.all(np.asarray(seams)))
        match = np.array_equal(np.asarray(states), exact)
        assert ok == should_pass
        assert match or not ok, "certificate false positive"
        if should_pass:
            assert match

    states, final_halo = viterbi_decode_time_sharded(
        jnp.asarray(log_B), jnp.asarray(log_pi), log_obs, mesh, halo=16
    )
    assert final_halo == 64
    np.testing.assert_array_equal(exact, np.asarray(states))


def test_track_sharded_pallas_batch_decode_bit_identical(rng):
    """viterbi_decode_batch_pallas(mesh=...) shards tracks over the data
    axis through the SAME batched kernels; decoded paths must be
    bit-identical to the single-device batch decode (banded fast path and
    dense fallback both), with mixed lengths."""
    from viterbi_spl_tpu.hmm.viterbi_pallas import viterbi_decode_batch_pallas

    mesh = make_mesh(data=8, seq=1)
    for banded in (True, False):
        A, pi, _ = realistic_hmm(rng)
        S = A.shape[0]
        tracks = []
        for i in range(10):  # not a multiple of 8: exercises track padding
            T = 40 + 17 * i
            path = np.clip(30 + np.cumsum(rng.integers(-1, 2, T)), 0, S - 2)
            obs = np.full((S, T), 1e-4, np.float32)
            obs[path, np.arange(T)] = 1.0
            obs /= obs.sum(0, keepdims=True)
            tracks.append(obs)
        single = viterbi_decode_batch_pallas(
            transition_matrix=A, prob_init=pi, probs_st_list=tracks,
            block_frames=32, allow_banded=banded,
        )
        sharded = viterbi_decode_batch_pallas(
            transition_matrix=A, prob_init=pi, probs_st_list=tracks,
            block_frames=32, allow_banded=banded, mesh=mesh,
        )
        for s, m in zip(single, sharded):
            np.testing.assert_array_equal(s, m)


# ---- tensor parallelism (dist/tp.py) ----------------------------------


def test_tp_spec_rule():
    """The tp shape rule shards exactly the trailing channel dims that
    divide the model-axis size, and replicates odd heads and scalars."""
    from jax.sharding import PartitionSpec as P

    from viterbi_spl_tpu.dist import tp_spec

    assert tp_spec((3, 3, 16, 64), 4) == P(None, None, None, "model")
    assert tp_spec((128, 64), 4) == P(None, "model")
    assert tp_spec((64,), 4) == P("model")
    # 361-class head does not divide 4 -> replicated
    assert tp_spec((128, 361), 4) == P()
    # too small to be worth splitting
    assert tp_spec((4,), 4) == P()
    assert tp_spec((), 4) == P()


def test_tp_shard_tree_places_leaves():
    """tp_shard_tree puts divisible channel dims on the model axis and
    replicates the rest — on a real 4x2 device mesh."""
    from viterbi_spl_tpu.dist import make_tp_mesh, tp_shard_tree

    mesh = make_tp_mesh(4, 2)
    tree = {
        "conv": {"kernel": np.zeros((3, 3, 8, 16), np.float32),
                 "bias": np.zeros((16,), np.float32)},
        "head": {"kernel": np.zeros((16, 361), np.float32)},
        "count": np.zeros((), np.int32),
    }
    sharded = tp_shard_tree(tree, mesh)
    assert "model" in str(sharded["conv"]["kernel"].sharding.spec)
    assert "model" in str(sharded["conv"]["bias"].sharding.spec)
    assert "model" not in str(sharded["head"]["kernel"].sharding.spec)
    assert "model" not in str(sharded["count"].sharding.spec)
    # values are unchanged by the placement
    np.testing.assert_array_equal(
        np.asarray(sharded["conv"]["kernel"]), tree["conv"]["kernel"]
    )


# ---- multi-host scaling cost model (scripts/scaling_cost_model.py) -----


def test_cost_model_hlo_byte_parser():
    """The HLO collective-byte parser must handle combined tuple results
    (incl. /*index=N*/ comments), skip %-prefixed operand references, and
    skip -done halves of async pairs."""
    import importlib.util
    from pathlib import Path

    path = (
        Path(__file__).parent.parent / "scripts" / "scaling_cost_model.py"
    )
    spec = importlib.util.spec_from_file_location("scaling_cost_model", path)
    scm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(scm)

    hlo = "\n".join([
        "%ar = (f32[5,5,3,32]{3,2,1,0}, /*index=5*/f32[128]{0}) "
        "all-reduce(%a, %b), channel_id=2",
        "%use = f32[4]{0} add(%ar, %all-reduce.47)",
        "%cp = f32[64,361]{1,0} collective-permute(%x), channel_id=3",
        "%cps = f32[8]{0} collective-permute-start(%y)",
        "%cpd = f32[8]{0} collective-permute-done(%cps)",
    ])
    out = scm.collective_bytes(hlo)
    assert out["all-reduce"]["count"] == 1
    assert out["all-reduce"]["result_bytes"] == (5 * 5 * 3 * 32 + 128) * 4
    assert out["collective-permute"]["count"] == 2  # plain + -start
    assert out["collective-permute"]["result_bytes"] == (64 * 361 + 8) * 4


def test_cost_model_seq_decode_bytes_match_analytic():
    """Measured per-device collective-permute bytes of the compiled
    seq-parallel decode must match the analytic halo+certificate
    expression (within the odd pred byte)."""
    import importlib.util
    from pathlib import Path

    path = (
        Path(__file__).parent.parent / "scripts" / "scaling_cost_model.py"
    )
    spec = importlib.util.spec_from_file_location("scaling_cost_model", path)
    scm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(scm)

    d = scm.measure_seq_decode(S=45, L=64, H=16, n_dev=8)
    got = d["measured_permute_bytes_per_device"]
    want = d["analytic_permute_bytes_per_device"]
    assert abs(got - want) <= 8, (got, want)
