"""Hand-derived parity fixtures for metrics/mel_eval.py.

mir_eval is not installable in this environment, so every expected value
below is computed BY HAND from the published mir_eval.melody algorithms
(github.com/craffel/mir_eval, melody.py, >= 0.6 semantics):

- freq_to_voicing: (|f|, f > 0) — negative estimate = unvoiced estimate,
- hz2cents: 1200*log2(f/10), zeros stay 0,
- resample_melody_series: cents held through zeros then `kind`-interpolated;
  a zero-order mask re-zeroes points whose previous source sample was 0;
  voicing is zero-order-hold; when the target timebase extends past the
  source, ONE terminal (freq 0, unvoiced) sample is appended at the new
  end time (no edge hold),
- to_cent_voicing: t=0 sample prepended when missing; est resampled onto
  the ref timebase (or both onto a constant-hop base); est padded with
  zeros / truncated to the ref length,
- accuracies: STRICT `< cent_tolerance` (the boundary is NOT correct) over
  frames where BOTH cent values are nonzero; chroma folds to the nearest
  octave; all ratios over ref-voiced frames (RPA/RCA) or all frames (OA).

The strict-`<` boundary also matches the reference's own accumulators
(diffs < 0.5 semitones, dcnet/softmax_viterbi.py:1771), so the in-repo
cross-check (metrics/melody.py vs evaluate_melody) is boundary-consistent.

Each test's docstring walks the arithmetic so the expected numbers can be
re-derived without running anything.
"""

import numpy as np
import pytest

from viterbi_spl_tpu.metrics.mel_eval import (
    evaluate_melody,
    hz2cents,
    overall_accuracy,
    raw_chroma_accuracy,
    raw_pitch_accuracy,
    resample_melody_series,
    to_cent_voicing,
    voicing_measures,
)

C100 = 1200.0 * np.log2(10.0)  # cents of 100 Hz above the 10 Hz base


def cents_to_hz(c):
    return 10.0 * 2.0 ** (np.asarray(c, np.float64) / 1200.0)


# ---------------------------------------------------------------------------
# aligned timebases: voicing convention, strict boundary, chroma fold
# ---------------------------------------------------------------------------

def test_aligned_basics_negative_freqs_and_octave():
    """6 aligned frames, hand-counted:

    idx  ref      est            ref_v  est_v  |cent diff|   counts
    0    100 Hz   100 Hz         1      1      0             pitch+chroma ok
    1    100 Hz   +49 cents      1      1      49            ok (strict <50)
    2    0        -100 Hz        0      0      —             correct unvoiced
    3    200 Hz   +51 cents      1      1      51            wrong (>50)
    4    100 Hz   50 Hz          1      1      1200          chroma ok only
    5    0        100 Hz         0      1      —             voicing FP

    VR  = voiced est among 4 ref-voiced = 4/4 = 1.0
    VFA = 1 FP among 2 ref-unvoiced = 0.5
    RPA = {0,1} of 4 = 0.5
    RCA = {0,1,4} of 4 = 0.75
    OA  = ({0,1} voiced-correct + {2} correct-unvoiced) / 6 = 0.5
    """
    t = np.arange(6) * 0.1
    ref = np.array([100.0, 100.0, 0.0, 200.0, 100.0, 0.0])
    est = np.array([
        100.0,
        cents_to_hz(hz2cents([100.0])[0] + 49.0),
        -100.0,
        cents_to_hz(hz2cents([200.0])[0] + 51.0),
        50.0,
        100.0,
    ])
    m = evaluate_melody(t, ref, t, est)
    assert m["Voicing Recall"] == pytest.approx(1.0)
    assert m["Voicing False Alarm"] == pytest.approx(0.5)
    assert m["Raw Pitch Accuracy"] == pytest.approx(0.5)
    assert m["Raw Chroma Accuracy"] == pytest.approx(0.75)
    assert m["Overall Accuracy"] == pytest.approx(0.5)


def test_exact_50_cent_boundary_is_incorrect():
    """mir_eval >= 0.6 (and the reference's accumulators) use STRICT `<`:
    a frame exactly 50 cents off is NOT correct; 49.999... is."""
    v = np.array([True])
    assert raw_pitch_accuracy(v, [1000.0], v, [1050.0]) == 0.0
    assert raw_pitch_accuracy(v, [1000.0], v, [1049.9999]) == 1.0
    assert raw_chroma_accuracy(v, [1000.0], v, [1000.0 + 1200.0 + 50.0]) == 0.0
    assert raw_chroma_accuracy(v, [1000.0], v, [1000.0 + 1200.0 + 49.9]) == 1.0
    assert overall_accuracy(v, [1000.0], v, [1050.0]) == 0.0
    assert overall_accuracy(v, [1000.0], v, [1049.9999]) == 1.0


def test_nonzero_cent_mask():
    """Frames where either cent value is 0 (i.e. 0 Hz slipped through, or a
    resampled est was re-zeroed) are excluded from pitch correctness even
    if |diff| < 50: ref=10 Hz gives exactly 0 cents."""
    v = np.array([True, True])
    # frame 0: ref_cent 0 (10 Hz) vs est_cent 30 -> masked out, not correct
    # frame 1: normal correct frame
    rpa = raw_pitch_accuracy(v, [0.0, 1000.0], v, [30.0, 1000.0])
    assert rpa == pytest.approx(0.5)
    oa = overall_accuracy(v, [0.0, 1000.0], v, [30.0, 1000.0])
    assert oa == pytest.approx(0.5)


def test_all_unvoiced_reference():
    """No ref-voiced frames: VR/RPA/RCA = 0 by special case; VFA counts the
    one voiced estimate among 4 unvoiced frames; OA counts the 3 correctly
    unvoiced frames."""
    t = np.arange(4) * 0.1
    ref = np.zeros(4)
    est = np.array([0.0, -100.0, 100.0, 0.0])
    m = evaluate_melody(t, ref, t, est)
    assert m["Voicing Recall"] == 0.0
    assert m["Raw Pitch Accuracy"] == 0.0
    assert m["Raw Chroma Accuracy"] == 0.0
    assert m["Voicing False Alarm"] == pytest.approx(0.25)
    assert m["Overall Accuracy"] == pytest.approx(0.75)


# ---------------------------------------------------------------------------
# resampling semantics
# ---------------------------------------------------------------------------

def test_terminal_zero_append_when_est_shorter():
    """est spans [0, 0.2], ref spans [0, 0.4] (5 frames, all voiced 100 Hz).

    mir_eval appends (t=0.4, freq 0, unvoiced) to the est series instead of
    holding the edge. Hand-walk of the resample onto [0,.1,.2,.3,.4]:
    - held cents [C,C,C,0->C] -> linear interp = C everywhere,
    - zero-order mask of raw [C,C,C,0]: previous sample at t=0.3 is C
      (kept), the t=0.4 query lands ON the appended 0 (zeroed),
    - voicing zero-hold of [1,1,1,0]: [1,1,1,1,0].
    So est = voiced 100 Hz on frames 0-3, unvoiced/0 on frame 4:
    VR = 4/5, RPA = 4/5 (frame 4 fails the nonzero mask), OA = 4/5.
    """
    ref_t = np.arange(5) * 0.1
    ref_f = np.full(5, 100.0)
    est_t = np.arange(3) * 0.1
    est_f = np.full(3, 100.0)
    m = evaluate_melody(ref_t, ref_f, est_t, est_f)
    assert m["Voicing Recall"] == pytest.approx(0.8)
    assert m["Raw Pitch Accuracy"] == pytest.approx(0.8)
    assert m["Overall Accuracy"] == pytest.approx(0.8)

    # the same behavior at the resample level
    c, v = resample_melody_series(
        est_t, hz2cents(est_f), np.ones(3, bool), ref_t
    )
    np.testing.assert_allclose(c[:4], C100)
    assert c[4] == 0.0
    np.testing.assert_array_equal(v, [True, True, True, True, False])


def test_est_longer_than_ref_truncates():
    """est spans [0, 0.4]; ref timebase is [0, 0.2]: est is resampled onto
    the 3 ref times (in-range) — extra est tail is simply never queried.
    All 3 frames match: everything = 1.0 except VFA = 0 (no unvoiced)."""
    ref_t = np.arange(3) * 0.1
    ref_f = np.full(3, 100.0)
    est_t = np.arange(5) * 0.1
    est_f = np.full(5, 100.0)
    m = evaluate_melody(ref_t, ref_f, est_t, est_f)
    assert m["Overall Accuracy"] == pytest.approx(1.0)
    assert m["Voicing False Alarm"] == 0.0


def test_interpolation_is_linear_in_cents_not_hz():
    """ref sampled at [0, 0.2] with 100 -> 400 Hz; est on the [0,.1,.2]
    grid plays 100/200/400 Hz. Cents are linear in log-frequency, so the
    resampled ref at t=0.1 is EXACTLY C+1200 (200 Hz): RPA = 1.
    (Linear-in-Hz interpolation would give 250 Hz = C+1586: frame wrong.)

    to_cent_voicing with hop=0.1 resamples BOTH series onto constant-hop
    timebases; est is already on that grid (same-timebase shortcut)."""
    ref_v, ref_c, est_v, est_c = to_cent_voicing(
        np.array([0.0, 0.2]), np.array([100.0, 400.0]),
        np.arange(3) * 0.1, np.array([100.0, 200.0, 400.0]),
        hop=0.1,
    )
    np.testing.assert_allclose(ref_c, [C100, C100 + 1200.0, C100 + 2400.0])
    np.testing.assert_allclose(est_c, ref_c)
    assert raw_pitch_accuracy(ref_v, ref_c, est_v, est_c) == 1.0


def test_zero_hold_across_voicing_flips():
    """est [0,.1,.2,.3] = [100 Hz, 0, -200 Hz, 100 Hz] (voicing 1,0,0,1)
    resampled onto ref times [.05,.15,.25] (t=0 gets prepended, so the ref
    timebase is [0,.05,.15,.25]; ref = 100 Hz everywhere).

    Hand-walk (cents: C=C100, D=C+1200 for 200 Hz):
    - raw est cents  [C, 0, D, C]; held: [C, C, D, C]
    - linear at .05 -> C (between C and C); at .15 -> (C+D)/2 = C+600;
      at .25 -> (D+C)/2 = C+600
    - zero-order mask: prev raw at .05 is C (keep); at .15 prev raw is 0
      (ZEROED); at .25 prev raw is D (keep)
    - voicing zero-hold of [1,0,0,1]: [1, 1, 0, 0]
    est on ref base: cents [C, C, 0, C+600], voicing [1,1,0,0].
    VR = 2/4; RPA = {0,1} of 4 = 0.5 (frame 2 masked, frame 3 off by 600);
    OA = 2/4.
    """
    m = evaluate_melody(
        np.array([0.05, 0.15, 0.25]), np.full(3, 100.0),
        np.arange(4) * 0.1, np.array([100.0, 0.0, -200.0, 100.0]),
    )
    assert m["Voicing Recall"] == pytest.approx(0.5)
    assert m["Raw Pitch Accuracy"] == pytest.approx(0.5)
    assert m["Overall Accuracy"] == pytest.approx(0.5)


def test_voicing_measures_zero_denominators():
    recall, fa = voicing_measures(np.zeros(3, bool), np.zeros(3, bool))
    assert recall == 0.0 and fa == 0.0


# ---------------------------------------------------------------------------
# boundary unification with the internal accumulators (metrics/melody.py)
# ---------------------------------------------------------------------------

def test_accumulator_boundary_matches_reference_strict():
    """The internal engine counts a frame EXACTLY 0.5 semitones off as
    incorrect (reference semantics, dcnet/softmax_viterbi.py:1771) — the
    same strict boundary evaluate_melody now uses at 50 cents."""
    import jax.numpy as jnp

    from viterbi_spl_tpu.metrics.melody import frame_counts

    counts = frame_counts(
        jnp.asarray([60.0, 60.0]),            # ref notes
        jnp.asarray([60.5, 60.4999]),         # est notes
        jnp.asarray([0.9, 0.9]),              # est peak probs
        jnp.asarray([0.5], jnp.float32),
    )
    assert int(counts["correct_pitches_wide"]) == 1  # only the 0.4999 frame
