"""App-level accuracy goldens: evaluate_posteriorgrams outputs pinned per
family x observation method on fixed synthetic posteriorgrams.

VERDICT round 1 gap: the synthetic app cycles assert the machinery runs,
not that OA/RPA values are pinned — a silent semantics drift in the
metrics, observation models, or decoders would pass. These goldens freeze
the full dual-path evaluation (raw + Viterbi, incl. the self-contained
mir_eval-semantics cross-check) for every family at every method.

The fixture file was produced by the tested implementation at the commit
introducing it (regenerate with `python tests/test_app_goldens.py` after
an INTENTIONAL semantics change and review the diff of the printed
means). Eventual target remains BASELINE.md's real-corpus table (needs
mounted data); reference anchors: dcnet/softmax_viterbi.py:55-84 (the
table), :3504-3531 (the cross-check prints).
"""

from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "goldens" / "app_metrics_v1.npz"
FAMILIES = ("dcnet", "msnet", "ftanet", "jdc", "tonet", "imm")
METHODS = ("shaun", "softmax-scaled", "softmax-unscaled")
PINNED = ("oa", "rpa_strict", "vrr", "vfa", "va")


def _family_tracks(family: str):
    """Deterministic synthetic posteriorgram tracks + HMM params for one
    family (the same parameter-estimation pipeline the apps run)."""
    import jax.numpy as jnp

    from viterbi_spl_tpu.families import family_spec
    from viterbi_spl_tpu.hmm import params as hmm_params
    from viterbi_spl_tpu.metrics.mel_eval import midi_to_hz

    import zlib

    spec = family_spec(family)
    rng = np.random.default_rng(zlib.crc32(family.encode()))
    n_bins = spec.n_bins

    # parameter tracks cover every bin (two full sweeps), random walks, AND
    # unvoiced stretches (state n_bins) — like real labels. Without
    # unvoiced mass the scaled likelihood divides by prior_unvoiced = 0
    # (inf -> NaN DP); without full bin coverage the floored priors of
    # unvisited bins dominate the posterior/prior ratio
    walks = []
    for _ in range(2):
        w = np.clip(
            n_bins // 2 + np.cumsum(rng.integers(-2, 3, 1500)), 0, n_bins - 1
        )
        uv = np.repeat(rng.random(151) > 0.7, 10)[:1500]
        walks.append(np.where(uv, n_bins, w))
    qtracks = [np.arange(n_bins), np.arange(n_bins)[::-1]] + walks
    if spec.d_max is None:  # imm: analytic transition
        A = hmm_params.imm_transition_matrix(
            bins_per_semitone=int(spec.bins_per_semitone), n_bins=n_bins
        )
        pi = np.full(n_bins + 1, 1.0 / (n_bins + 1), np.float32)
    else:
        stats = hmm_params.count_statistics(qtracks, n_bins)
        A = hmm_params.shape_transition_matrix(
            stats.transition_counts,
            np.array([[0.98, 0.02], [0.02, 0.98]]),
            n_bins,
            spec.d_max,
            spec.floor,
        )
        pi = hmm_params.shape_init_probs(stats.p_steady, p_th=1e-4)

    tracks = []
    for i in range(3):
        T = (120, 150, 97)[i]
        path = np.clip(
            n_bins // 2 + np.cumsum(rng.integers(-2, 3, T)), 0, n_bins - 1
        )
        voiced = np.repeat(rng.random(T // 10 + 1) > 0.3, 10)[:T]
        logits = rng.normal(-2.0, 1.0, (T, n_bins)).astype(np.float32)
        logits[np.arange(T), path] += np.where(voiced, 6.0, 0.0)
        notes = np.where(voiced, spec.note_range[path], 0.0).astype(np.float32)
        freqs = np.where(notes > 0, midi_to_hz(notes), 0.0)
        track = dict(
            logits=logits,
            notes=notes,
            original=dict(
                times=np.arange(T) * spec.hop_seconds, freqs=freqs
            ),
        )
        if family == "jdc":
            # jdc's raw path thresholds the model's combined voicing head
            # (jdc/acoustic_module.py:74-81): pin that path too
            track["voicing_logits"] = (
                np.where(voiced, 3.0, -3.0) + rng.normal(0, 0.5, T)
            ).astype(np.float32)
        tracks.append(track)
    return spec, A, pi, tracks


def _evaluate(family: str, method: str) -> dict:
    from viterbi_spl_tpu.harness.evaluate import (
        DecoderSetup, evaluate_posteriorgrams,
    )

    spec, A, pi, tracks = _family_tracks(family)
    # imm's documented threshold is a log-energy; the synthetic logits here
    # are ordinary logits, so pin a mid-scale value in the same domain
    threshold = 0.5 if not spec.threshold_is_logit else 0.0
    setup = DecoderSetup(
        transition_matrix=A,
        init_probs=pi,
        n_bins=spec.n_bins,
        note_min=spec.note_min,
        bins_per_semitone=spec.bins_per_semitone,
        spw=spec.spw,
        voicing_threshold=threshold,
        hop_seconds=spec.hop_seconds,
        method=method,
        threshold_is_logit=spec.threshold_is_logit,
        interp_est_notes=spec.interp_est_notes,
    )
    return evaluate_posteriorgrams(setup, tracks)


def _flatten(family: str, method: str, res: dict) -> dict:
    out = {}
    for pathname in ("raw", "viterbi"):
        for metric in PINNED:
            key = f"{family}/{method}/{pathname}/{metric}"
            out[key] = np.asarray(res[pathname][metric], np.float64)
    out[f"{family}/{method}/mir_eval_oas_viterbi"] = np.asarray(
        res["mir_eval_oas_viterbi"], np.float64
    )
    return out


@pytest.mark.parametrize("family", FAMILIES)
@pytest.mark.parametrize("method", METHODS)
def test_app_accuracy_golden(family, method):
    golden = np.load(GOLDEN)
    res = _evaluate(family, method)
    # the accumulated OA must agree with the self-contained mir_eval
    # semantics per track (the reference's cross-check, :3504-3531)
    assert max(abs(d) for d in res["cross_check_diff_viterbi"]) < 1e-6
    for key, val in _flatten(family, method, res).items():
        np.testing.assert_allclose(
            val, golden[key], rtol=0, atol=1e-6, err_msg=key
        )


if __name__ == "__main__":
    # regenerate the golden fixture (review the printed means!)
    store = {}
    for family in FAMILIES:
        for method in METHODS:
            res = _evaluate(family, method)
            store.update(_flatten(family, method, res))
            print(
                f"{family:8s} {method:18s} raw OA {res['raw_mean_oa']:.4f} "
                f"viterbi OA {res['viterbi_mean_oa']:.4f}"
            )
    GOLDEN.parent.mkdir(exist_ok=True)
    np.savez(GOLDEN, **store)
    print(f"wrote {GOLDEN} ({len(store)} arrays)")
