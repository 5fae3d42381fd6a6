"""Threshold-sweep tooling + runtime utils tests."""

import numpy as np
import pytest

from viterbi_spl_tpu.harness.threshold import hard_vs_auto, sweep_voicing_thresholds
from viterbi_spl_tpu.utils import Timer, configure_logging, device_summary


def _tracks_and_setup(rng, n_tracks=2, T=250, n_bins=40):
    from viterbi_spl_tpu.harness.evaluate import DecoderSetup
    from viterbi_spl_tpu.hmm import params as P

    q = [np.clip(20 + np.cumsum(rng.integers(-1, 2, 600)), 0, n_bins - 1)]
    stats = P.count_statistics(q, n_bins)
    A = P.shape_transition_matrix(
        stats.transition_counts, np.array([[0.97, 0.03], [0.05, 0.95]]), n_bins, 4, 2
    )
    pi = P.shape_init_probs(stats.p_steady)
    setup = DecoderSetup(
        transition_matrix=A, init_probs=pi, n_bins=n_bins,
        note_min=40.0, bins_per_semitone=5.0, spw=3,
        voicing_threshold=0.5, hop_seconds=0.01,
    )
    tracks = []
    for _ in range(n_tracks):
        path = np.clip(20 + np.cumsum(rng.integers(-1, 2, T)), 0, n_bins - 1)
        # voiced runs with peak prob ~0.9, unvoiced with ~0.2
        voiced = np.repeat(rng.random(T // 25 + 1) > 0.3, 25)[:T]
        notes = np.where(voiced, 40.0 + path / 5.0, 0.0).astype(np.float32)
        logits = np.full((T, n_bins), -4.0, np.float32)
        peak_logit = np.where(voiced, 2.2, -1.4)  # sigmoid: 0.9 / 0.2
        logits[np.arange(T), path] = peak_logit
        tracks.append(dict(logits=logits, notes=notes))
    return setup, tracks


def test_sweep_selects_separating_threshold(rng):
    setup, tracks = _tracks_and_setup(rng)
    out = sweep_voicing_thresholds(setup, tracks)
    assert len(out["thresholds"]) == 99
    assert 0.2 < out["best_threshold"] < 0.9
    k = int(np.argmax(out["va"]))
    assert out["va"][k] > 0.95
    # OA at the separating threshold beats the extremes
    assert out["oa"][k] > out["oa"][0] and out["oa"][k] > out["oa"][-1]


def test_hard_vs_auto(rng):
    setup, val_tracks = _tracks_and_setup(rng)
    _, test_tracks = _tracks_and_setup(rng)
    out = hard_vs_auto(setup, val_tracks, test_tracks, hard_threshold=0.99)
    # a 0.99 hard threshold kills voicing recall; auto must beat it
    assert out["auto"]["raw_mean_oa"] > out["hard"]["raw_mean_oa"]


def test_timer_and_logging():
    configure_logging(debug=False)
    t = Timer()
    with t.span("a"):
        sum(range(1000))
    with t.span("a"):
        pass
    assert t.counts["a"] == 2
    assert "a:" in t.report()
    assert "device" in device_summary()


def test_obs_hyperparam_sweep(rng):
    from viterbi_spl_tpu.harness.threshold import sweep_obs_hyperparams

    setup, tracks = _tracks_and_setup(rng, n_tracks=1, T=150)
    out = sweep_obs_hyperparams(setup, tracks, ps=(0.6, 0.8), scales=(1.0, 2.0))
    assert out["oa"].shape == (2, 2)
    assert out["best_p"] in (0.6, 0.8)
    assert np.all(out["oa"] > 0.5)


def test_sweep_logit_domain_imm_grid(rng):
    """With threshold_is_logit (imm), the sweep compares raw max frame
    logits (log energies) against the logit(p) grid — the reference's
    calibration (imm/thresholding.py:156-347; 2.442347 = logit(0.92)) —
    and returns the best threshold in the logit domain."""
    import dataclasses

    setup, tracks = _tracks_and_setup(rng)
    setup = dataclasses.replace(setup, threshold_is_logit=True)
    # energies: voiced frames peak at ~3.0, unvoiced at ~1.0 — separable
    # by a logit-domain threshold around 2, NOT by any probability
    for t in tracks:
        voiced = t["notes"] > 0.1
        lg = np.full_like(t["logits"], -2.0)
        lg[np.arange(len(voiced)), t["logits"].argmax(1)] = np.where(
            voiced, 3.0, 1.0
        )
        t["logits"] = lg

    out = sweep_voicing_thresholds(setup, tracks)
    th = np.asarray(out["thresholds"])
    # grid is logit(p), p in .01...99
    assert len(th) == 99
    assert np.isclose(th[0], np.log(0.01 / 0.99), atol=1e-5)
    assert np.isclose(th[91], 2.442347, atol=1e-4)
    # the best threshold separates 1.0 from 3.0 (in the logit domain)
    assert 1.0 < out["best_threshold"] < 3.0
    k = int(np.argmin(np.abs(th - out["best_threshold"])))
    assert out["va"][k] > 0.99
