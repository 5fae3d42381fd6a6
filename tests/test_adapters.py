"""Family adapter tests + jdc/imm-specific decoding paths."""

import numpy as np
import pytest

import jax.numpy as jnp

from viterbi_spl_tpu.data import chunk_fixed
from viterbi_spl_tpu.models.adapters import (
    dcnet_pitch_logits,
    ftanet_pitch_logits,
    imm_pitch_logits,
    jdc_est_notes,
    jdc_outputs,
    msnet_pitch_logits,
    reassemble_chunks,
    tonet_pitch_logits,
)


def test_chunk_reassemble_roundtrip(rng):
    x = rng.normal(size=(100, 321)).astype(np.float32)
    chunks, _, T = chunk_fixed(x, np.zeros(100, np.float32), 31)
    back = reassemble_chunks(chunks, T)
    np.testing.assert_array_equal(back, x)


def test_msnet_adapter(rng):
    logits = rng.normal(size=(50, 321)).astype(np.float32)
    out = msnet_pitch_logits(logits)
    assert out.shape == (50, 320)
    np.testing.assert_allclose(out, logits[:, 1:] - logits[:, :1], rtol=1e-6)


def test_dcnet_adapter(rng):
    out = dcnet_pitch_logits(rng.normal(size=(1, 40, 320)).astype(np.float32))
    assert out.shape == (40, 320)


def test_ftanet_adapter(rng):
    chunks = rng.normal(size=(3, 128, 321)).astype(np.float32)
    out = ftanet_pitch_logits(chunks, valid_frames=300)
    assert out.shape == (300, 320)


def test_tonet_adapter(rng):
    chunks = rng.normal(size=(2, 361, 128)).astype(np.float32)
    out = tonet_pitch_logits(chunks, valid_frames=200)
    assert out.shape == (200, 360)
    # class-major transposition: chunk 0 frame 0 equals column 0
    expected0 = chunks[0, 1:, 0] - chunks[0, 0, 0]
    np.testing.assert_allclose(out[0], expected0, rtol=1e-5)


def test_jdc_adapter(rng):
    pitch = rng.normal(size=(4, 31, 722)).astype(np.float32)
    voicing = rng.normal(size=(4, 31)).astype(np.float32)
    p, v = jdc_outputs(pitch, voicing, valid_frames=100)
    assert p.shape == (100, 721) and v.shape == (100,)

    from viterbi_spl_tpu.models.targets import JDC_NOTE_RANGE

    notes = jdc_est_notes(np.array([0, 100, 720, 721]), JDC_NOTE_RANGE)
    assert notes[0] == pytest.approx(38.0)
    assert notes[2] == notes[3] == pytest.approx(83.0)


def test_imm_adapter_and_logit_threshold(rng):
    """imm: log-energy logits, threshold in the same domain, no sigmoid
    interpretation of the raw-path voicing score."""
    from viterbi_spl_tpu.harness.evaluate import DecoderSetup, decode_and_score_track
    from viterbi_spl_tpu.hmm.params import imm_transition_matrix

    U = 40
    log_e = rng.normal(size=(U, 60)).astype(np.float32)  # [U, N]
    logits = imm_pitch_logits(log_e)
    assert logits.shape == (60, U)

    A = imm_transition_matrix(bins_per_semitone=4, n_bins=U)
    pi = np.full(U + 1, 1.0 / (U + 1))
    setup = DecoderSetup(
        transition_matrix=A, init_probs=pi, n_bins=U,
        note_min=40.0, bins_per_semitone=4.0, spw=3,
        voicing_threshold=0.5,  # log-energy units
        hop_seconds=256 / 44100, threshold_is_logit=True,
    )
    notes = np.where(rng.random(60) < 0.5, 0.0, 50.0).astype(np.float32)
    r = decode_and_score_track(setup, logits, notes)
    assert "viterbi_counts" in r
    # raw voicing compares max log-energy against the raw threshold
    expected_voicing = logits.max(axis=1) > 0.5
    np.testing.assert_array_equal(r["raw_voiced"], expected_voicing)


def test_jdc_voicing_logit_path(rng):
    """jdc: separate voicing logits drive the raw-path decision; est notes
    come from direct bin mapping."""
    from viterbi_spl_tpu.harness.evaluate import DecoderSetup, decode_and_score_track
    from viterbi_spl_tpu.hmm import params as P

    n_bins = 30
    tracks = [np.clip(15 + np.cumsum(rng.integers(-1, 2, 400)), 0, n_bins - 1)]
    stats = P.count_statistics(tracks, n_bins)
    A = P.shape_transition_matrix(
        stats.transition_counts, np.array([[0.95, 0.05], [0.1, 0.9]]), n_bins, 4, 2
    )
    pi = P.shape_init_probs(stats.p_steady)
    setup = DecoderSetup(
        transition_matrix=A, init_probs=pi, n_bins=n_bins,
        note_min=38.0, bins_per_semitone=16.0, spw=3,
        voicing_threshold=0.34, hop_seconds=0.01, interp_est_notes=False,
    )
    T = 50
    logits = rng.normal(size=(T, n_bins)).astype(np.float32)
    vlogits = rng.normal(size=T).astype(np.float32)
    notes = np.where(rng.random(T) < 0.5, 0.0, 38.5).astype(np.float32)
    r = decode_and_score_track(setup, logits, notes, voicing_logits=vlogits)
    th_logit = np.log(0.34 / 0.66)
    np.testing.assert_array_equal(r["raw_voiced"], vlogits > th_logit)
    # direct bin mapping: est notes live exactly on the grid
    grid = 38.0 + np.arange(n_bins) / 16.0
    assert np.all(np.isin(np.round(r["est_notes_viterbi"], 5), np.round(grid, 5)))
