"""Golden-file regression tests: deterministic inputs -> stored outputs.

Guards against silent behavior drift in the front-ends, observation model,
and decoder across refactors (the fixtures were produced by the tested
implementations at the commit that introduced this file)."""

from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "goldens" / "golden_v1.npz"


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def _audio_8k():
    sr = 8000
    t = np.arange(sr * 2) / sr
    return (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.3 * np.sin(2 * np.pi * 554 * t)
        + 0.05 * np.sin(2 * np.pi * 60 * t)
    ).astype(np.float32)


def test_cfp_golden(golden):
    from viterbi_spl_tpu.frontend import CFP, FTANET_CFP

    feat = CFP(FTANET_CFP).features(_audio_8k())[::7].astype(np.float16)
    np.testing.assert_allclose(
        feat.astype(np.float32), golden["cfp_feat"].astype(np.float32),
        atol=2e-3,
    )


def test_nsgt_golden(golden):
    from viterbi_spl_tpu.frontend.nsgt import NSGT

    sr = 44100
    t = np.arange(2**16) / sr
    audio = (
        0.5 * np.sin(2 * np.pi * 220 * t) + 0.3 * np.sin(2 * np.pi * 554 * t)
    ).astype(np.float32)
    mag = np.abs(np.asarray(NSGT(2**16).forward(audio)))[:, ::16]
    ref = golden["nsgt_mag"].astype(np.float32)
    scale = max(ref.max(), 1e-9)
    np.testing.assert_allclose(mag / scale, ref / scale, atol=2e-3)


def test_obs_golden(golden):
    from viterbi_spl_tpu.hmm.obs import shaun_observation_probs

    # the generator drew these logits first from default_rng(123)
    rng = np.random.default_rng(123)
    logits = rng.normal(size=(64, 80)).astype(np.float32) * 2
    obs = np.asarray(shaun_observation_probs(logits, 0.3, 4))
    np.testing.assert_allclose(obs, golden["obs"], rtol=1e-5, atol=1e-7)


def test_viterbi_golden(golden):
    from viterbi_spl_tpu.hmm.oracle import viterbi_oracle
    from viterbi_spl_tpu.hmm.viterbi import viterbi_decode_jax

    A, pi, probs = golden["viterbi_A"], golden["viterbi_pi"], golden["viterbi_probs"]
    expected = golden["viterbi_path"]
    np.testing.assert_array_equal(
        viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=probs), expected
    )
    np.testing.assert_array_equal(
        viterbi_decode_jax(transition_matrix=A, prob_init=pi, probs_st=probs),
        expected,
    )
