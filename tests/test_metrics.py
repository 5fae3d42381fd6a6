"""Metrics tests: mir_eval-equivalent module + vectorized accumulator engine,
including the reference's own cross-check (accumulated OA == evaluate OA)."""

import numpy as np
import pytest

from viterbi_spl_tpu.metrics import (
    MelodyMetrics,
    est_notes_interp,
    evaluate_melody,
    frame_counts,
    hz_to_midi,
    midi_to_hz,
    resample_melody_series,
)
from viterbi_spl_tpu.metrics.mel_eval import (
    est_notes_with_voicing_to_hz,
    hz2cents,
    voicing_measures,
)


def test_hz_midi_roundtrip():
    notes = np.array([23.6, 60.0, 69.0, 87.4])
    np.testing.assert_allclose(hz_to_midi(midi_to_hz(notes)), notes, rtol=1e-10)
    assert midi_to_hz(np.array([69.0]))[0] == pytest.approx(440.0)
    assert hz_to_midi(np.array([0.0]))[0] == 0.0


def test_hz2cents():
    assert hz2cents(np.array([10.0]))[0] == pytest.approx(0.0)
    assert hz2cents(np.array([20.0]))[0] == pytest.approx(1200.0)
    assert hz2cents(np.array([0.0]))[0] == 0.0


def test_voicing_measures():
    ref = np.array([1, 1, 0, 0], bool)
    est = np.array([1, 0, 1, 0], bool)
    recall, fa = voicing_measures(ref, est)
    assert recall == 0.5 and fa == 0.5


def test_evaluate_perfect():
    times = np.arange(100) * 0.01
    freqs = np.where(np.arange(100) % 3 == 0, 0.0, 220.0)
    m = evaluate_melody(times, freqs, times, freqs)
    assert m["Overall Accuracy"] == 1.0
    assert m["Raw Pitch Accuracy"] == 1.0
    assert m["Voicing Recall"] == 1.0
    assert m["Voicing False Alarm"] == 0.0


def test_evaluate_octave_error():
    times = np.arange(50) * 0.01
    ref = np.full(50, 220.0)
    est = np.full(50, 440.0)  # octave up
    m = evaluate_melody(times, ref, times, est)
    assert m["Raw Pitch Accuracy"] == 0.0
    assert m["Raw Chroma Accuracy"] == 1.0


def test_negative_freq_voicing_convention():
    """Negative est freq = unvoiced estimate whose pitch still scores RPA."""
    times = np.arange(50) * 0.01
    ref = np.full(50, 220.0)
    est = np.full(50, -220.0)
    m = evaluate_melody(times, ref, times, est)
    assert m["Raw Pitch Accuracy"] == 1.0
    assert m["Overall Accuracy"] == 0.0  # all voicing decisions wrong
    assert m["Voicing Recall"] == 0.0


def test_resample_melody_series_hold_through_zeros():
    times = np.array([0.0, 0.1, 0.2, 0.3])
    cents = np.array([1200.0, 0.0, 1300.0, 1400.0])
    voicing = np.array([True, False, True, True])
    new_times = np.array([0.0, 0.05, 0.1, 0.15, 0.25])
    c, v = resample_melody_series(times, cents, voicing, new_times)
    # at 0.05: linear between 1200 (held) and 1200 (held through zero) but
    # the zero-order mask of raw freqs at 0.05 is freq(0.0)=1200 != 0 -> kept
    assert c[0] == 1200.0
    assert c[2] == 0.0  # lands exactly on the zero sample -> masked
    assert not v[2]
    assert v[4]


def test_resample_identity():
    times = np.arange(10) * 0.1
    cents = np.linspace(100, 200, 10)
    v = np.ones(10, bool)
    c2, v2 = resample_melody_series(times, cents, v, times)
    np.testing.assert_array_equal(c2, cents)


def test_est_notes_interp_peak_weighting():
    T, n_bins = 3, 20
    probs = np.full((T, n_bins), 0.01, np.float32)
    probs[0, 10] = 0.9
    probs[1, 10] = 0.9
    probs[1, 11] = 0.9  # symmetric mass -> midpoint
    probs[2, 0] = 0.8
    peaks = np.array([10, 10, 0], np.int32)
    notes = np.asarray(
        est_notes_interp(peaks, probs, note_min=23.6, bins_per_semitone=5, n_bins=n_bins)
    )
    assert notes[0] == pytest.approx(23.6 + 10 / 5, abs=0.01)
    assert notes[1] == pytest.approx(23.6 + 10.5 / 5, abs=0.01)
    # edge peak at bin 0: only bins {0, 1} contribute
    assert notes[2] == pytest.approx(23.6 + (0.01 * 1) / 0.81 / 5, abs=1e-4)


def test_frame_counts_and_accumulator_vs_evaluate(rng):
    """The reference's cross-check: accumulator OA must equal the
    mir_eval-semantics OA computed from signed frequencies
    (dcnet/softmax_viterbi.py:3504-3531)."""
    hop = 256.0 / 44100.0
    T = 400
    note_min = 23.6
    ref_notes = np.where(
        rng.random(T) < 0.3, 0.0, rng.uniform(40, 80, T)
    )
    est_notes = np.where(
        rng.random(T) < 0.8,
        ref_notes + rng.normal(0, 0.3, T),
        rng.uniform(40, 80, T),
    )
    est_notes = np.maximum(est_notes, note_min + 0.1)
    est_peak_probs = rng.uniform(0, 1, T)
    th = 0.4

    counts = frame_counts(
        ref_notes.astype(np.float32),
        est_notes.astype(np.float32),
        est_peak_probs.astype(np.float32),
        np.array([th], np.float32),
    )
    mm = MelodyMetrics(num_recs=1, thresholds=np.array([th]))
    mm.update(0, {k: np.asarray(v) for k, v in counts.items()})
    res = mm.results()

    # mir_eval-semantics path on the identical timebase
    est_voicing = est_peak_probs > th
    signed_notes = np.where(est_voicing, est_notes, -est_notes)
    est_freqs = est_notes_with_voicing_to_hz(signed_notes, note_min)
    ref_freqs = np.where(ref_notes > 0.1, midi_to_hz(ref_notes), 0.0)
    times = np.arange(T) * hop
    m = evaluate_melody(times, ref_freqs, times, est_freqs)

    assert res["oa"][0] == pytest.approx(m["Overall Accuracy"], abs=1e-6)
    assert res["vrr"][0] == pytest.approx(m["Voicing Recall"], abs=1e-6)
    assert res["vfa"][0] == pytest.approx(m["Voicing False Alarm"], abs=1e-6)
    assert res["rpa_strict"][0] <= res["rpa_wide"][0] + 1e-9
    assert res["rca_wide"][0] >= res["rpa_wide"][0] - 1e-9


def test_threshold_grid_best_selection(rng):
    """Best threshold maximizes mean voicing accuracy across recordings."""
    T = 300
    mm = MelodyMetrics.validation_grid(num_recs=2)
    for rec in range(2):
        ref_notes = np.where(rng.random(T) < 0.4, 0.0, 60.0).astype(np.float32)
        # peak prob correlates with voicing: voiced ~ U(.6, 1), unvoiced ~ U(0, .4)
        probs = np.where(
            ref_notes > 0, rng.uniform(0.6, 1.0, T), rng.uniform(0.0, 0.4, T)
        ).astype(np.float32)
        counts = frame_counts(
            ref_notes, np.full(T, 60.0, np.float32), probs, mm.thresholds
        )
        mm.update(rec, {k: np.asarray(v) for k, v in counts.items()})
    idx, th = mm.best_voicing_threshold()
    assert 0.39 <= th <= 0.61  # separating threshold
    res = mm.results(idx)
    assert res["va"].mean() > 0.99


def test_fixed_voicing_counts():
    from viterbi_spl_tpu.metrics.melody import frame_counts_fixed_voicing

    ref = np.array([0.0, 60.0, 60.0, 0.0], np.float32)
    est = np.array([60.0, 60.0, 61.5, 60.0], np.float32)
    voic = np.array([False, True, True, False])
    c = frame_counts_fixed_voicing(ref, est, voic)
    assert int(c["voiced"]) == 2
    assert int(c["correct_voiced"][0]) == 2
    assert int(c["correct_unvoiced"][0]) == 2
    assert int(c["correct_pitches_strict"][0]) == 1  # 61.5 is off by 1.5
    mm = MelodyMetrics(num_recs=1, thresholds=np.array([0.5]))
    mm.update(0, {k: np.asarray(v) for k, v in c.items()})
    assert mm.results()["oa"][0] == pytest.approx(0.75)
