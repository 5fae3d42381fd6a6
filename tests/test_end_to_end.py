"""End-to-end integration: the minimum slices from SURVEY.md §7.

1. synthetic audio -> CFP features -> (untrained) MSNet -> smoothed-CE
   training steps reduce the loss,
2. synthetic posteriorgram -> observation model -> Viterbi (jax + pallas
   interpret) -> metrics -> evaluate: pipeline consistency,
3. oracle-posteriorgram chain achieves near-perfect OA through the whole
   framework stack (features would come from a trained model in practice).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viterbi_spl_tpu.data import TrackDataset, training_snippets
from viterbi_spl_tpu.frontend import CFP, FTANET_CFP
from viterbi_spl_tpu.harness.evaluate import DecoderSetup, evaluate_posteriorgrams
from viterbi_spl_tpu.hmm import params as P
from viterbi_spl_tpu.metrics.mel_eval import midi_to_hz
from viterbi_spl_tpu.models import MSNet, softmax_smoothed_loss
from viterbi_spl_tpu.models.targets import _msnet_note_range


def synth_melody_audio(rng, sr, seconds, notes_hz, note_dur=0.25):
    """Piecewise-constant melody over a chord background."""
    n = int(sr * seconds)
    t = np.arange(n) / sr
    seg = (t / note_dur).astype(int) % len(notes_hz)
    f0 = np.asarray(notes_hz)[seg]
    phase = np.cumsum(2 * np.pi * f0 / sr)
    y = 0.6 * np.sin(phase) + 0.3 * np.sin(2 * phase)
    y += 0.05 * rng.normal(size=n)
    return y.astype(np.float32), f0


def test_cfp_msnet_training_slice(rng):
    """Audio -> CFP -> MSNet -> loss decreases over a few optimizer steps."""
    import optax

    sr = 8000
    y, f0 = synth_melody_audio(rng, sr, 2.0, [220.0, 262.0, 330.0])
    cfp = CFP(FTANET_CFP)
    feat = cfp.features(y)  # [T, 320, 3]
    hop_notes = 12 * np.log2(
        np.maximum(f0[:: FTANET_CFP.hop_size], 1.0) / 440.0
    ) + 69
    T = min(len(feat), len(hop_notes))
    feat, notes = feat[:T], hop_notes[:T].astype(np.float32)

    ds = TrackDataset(
        ["s"],
        lambda tid: feat,
        lambda tid: dict(
            notes=notes, original=dict(times=np.arange(T) * 0.01, freqs=f0[:T])
        ),
    )
    snippets = training_snippets(ds, 32, rng)

    model = MSNet()
    x0 = jnp.asarray(next(snippets)["spectrogram"])[None]
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, spec, notes):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats},
                spec, train=True,
                rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"],
            )
            return softmax_smoothed_loss(notes, out), upd["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    losses = []
    for _ in range(8):
        b = next(snippets)
        if b["spectrogram"].shape[0] != 32:
            continue
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state,
            jnp.asarray(b["spectrogram"])[None], jnp.asarray(b["notes"])[None],
        )
        losses.append(float(loss))
    assert len(losses) >= 4
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_posteriorgram_to_metrics_full_chain(rng):
    """Oracle posteriorgrams through obs model + decode + metrics: OA ~ 1."""
    n_bins = 320
    note_range = _msnet_note_range()
    note_min = float(note_range[0])
    T = 600

    # HMM params from synthetic validation statistics (the reference's
    # offline pipeline); voiced/unvoiced runs alternate like real melodies
    def runs(total, mean_v=60, mean_u=12):
        segs, voiced, pos = [], True, 100
        while sum(len(s) for s in segs) < total:
            ln = int(rng.integers(mean_v // 2, mean_v * 2)) if voiced else int(
                rng.integers(mean_u // 2, mean_u * 2)
            )
            if voiced:
                walk = np.clip(pos + np.cumsum(rng.integers(-2, 3, ln)), 0, n_bins - 1)
                pos = int(walk[-1])
                segs.append(walk)
            else:
                segs.append(np.full(ln, n_bins))
            voiced = not voiced
        return np.concatenate(segs)[:total]

    qtracks = [runs(2000)]
    stats = P.count_statistics(qtracks, n_bins)
    d_max = P.single_side_d_max(256 / 44100, 60)
    A = P.shape_transition_matrix(
        stats.transition_counts, stats.switch, n_bins, max(d_max, 3), floor=2
    )
    pi = P.shape_init_probs(stats.p_steady)

    setup = DecoderSetup(
        transition_matrix=A, init_probs=pi, n_bins=n_bins,
        note_min=note_min, bins_per_semitone=5.0, spw=5,
        voicing_threshold=0.5, hop_seconds=256 / 44100,
    )

    # synthetic "well-trained" logits with run-structured voicing
    path = np.clip(100 + np.cumsum(rng.integers(-1, 2, T)), 0, n_bins - 1)
    vseq = runs(T)
    voiced = vseq < n_bins
    notes = np.where(voiced, note_range[path], 0.0).astype(np.float32)
    logits = np.full((T, n_bins), -8.0, np.float32)
    logits[np.arange(T), path] = np.where(voiced, 8.0, -8.0)
    freqs = np.where(notes > 0, midi_to_hz(notes), 0.0)
    tracks = [dict(
        logits=logits, notes=notes,
        original=dict(times=np.arange(T) * setup.hop_seconds, freqs=freqs),
    )]

    out = evaluate_posteriorgrams(setup, tracks)
    assert out["raw_mean_oa"] > 0.97
    assert out["viterbi_mean_oa"] > 0.97
    assert abs(out["cross_check_diff_viterbi"][0]) < 1e-6

    # softmax observation variants run through the same chain
    for method in ("softmax-unscaled", "softmax-scaled"):
        import dataclasses

        s2 = dataclasses.replace(setup, method=method)
        out2 = evaluate_posteriorgrams(s2, tracks)
        assert out2["viterbi_mean_oa"] > 0.9, method
