"""Family registry + HMM artifact pipeline tests."""

import numpy as np
import pytest

from viterbi_spl_tpu.cli import build_hmm_artifacts, load_hmm_artifacts
from viterbi_spl_tpu.cli.hmm_artifacts import quantize_tracks_for_family
from viterbi_spl_tpu.families import DCNET_SWITCH, FAMILIES, family_spec


def test_family_specs():
    for name in FAMILIES:
        s = family_spec(name)
        assert s.n_bins in (320, 360, 721)
        assert len(s.note_range) == s.n_bins
    assert family_spec("dcnet").note_min == pytest.approx(23.6)
    assert family_spec("msnet").note_min == pytest.approx(23.274, abs=1e-3)
    assert family_spec("jdc").note_range[-1] == pytest.approx(83.0)
    assert family_spec("tonet").n_bins == 360
    # ftanet/tonet d_max from the 35.92 oct/s rule at 10 ms
    assert family_spec("ftanet").d_max == int(35.92 * 0.01 * 60 * 1.3 // 2)
    assert family_spec("imm").d_max is None
    np.testing.assert_allclose(DCNET_SWITCH.sum(axis=1), 1.0)


def test_artifact_pipeline_roundtrip(tmp_path, rng):
    spec = family_spec("dcnet")
    notes = [
        np.where(
            rng.random(800) < 0.2, 0.0, rng.uniform(30, 80, 800)
        ).astype(np.float32)
        for _ in range(3)
    ]
    q = quantize_tracks_for_family(notes, spec)
    assert all(t.max() <= spec.n_bins for t in q)

    out = build_hmm_artifacts(q, spec, tmp_path, switch_override=DCNET_SWITCH)
    loaded = load_hmm_artifacts(tmp_path)
    np.testing.assert_array_equal(out["transition_matrix"], loaded["transition_matrix"])
    np.testing.assert_array_equal(out["init_probs"], loaded["init_probs"])
    # artifacts decode
    from viterbi_spl_tpu.hmm.oracle import viterbi_oracle

    obs = rng.random((spec.n_bins + 1, 50)).astype(np.float32)
    obs /= obs.sum(0, keepdims=True)
    states = viterbi_oracle(
        transition_matrix=loaded["transition_matrix"],
        prob_init=loaded["init_probs"],
        probs_st=obs,
    )
    assert states.shape == (50,)

    # header bitcompat: reloadable by the plain loader with expected names
    from viterbi_spl_tpu.io import load_array

    for fname, rec in (
        ("transition_int.dat", "transition_int"),
        ("p_steady.dat", "p_steady"),
        ("switch.dat", "switch"),
    ):
        name, _ = load_array(tmp_path / fname)
        assert name == rec


def test_cli_main(tmp_path, rng):
    from viterbi_spl_tpu.cli.hmm_artifacts import main

    notes = np.where(rng.random(500) < 0.3, 0.0, rng.uniform(45, 75, 500)).astype(
        np.float32
    )
    f = tmp_path / "notes0.npy"
    np.save(f, notes)
    out = tmp_path / "artifacts"
    main(["--family", "tonet", "--notes", str(f), "--out", str(out)])
    loaded = load_hmm_artifacts(out)
    assert loaded["transition_matrix"].shape == (361, 361)
