"""Label smoothing + training losses shared by the model families.

The reference trains every family against Gaussian-blurred note targets
(sigma in semitones, cutoff 4e-3) on its pitch-bin grid:

- dcnet: per-bin sigmoid BCE, no non-melody class, notes clipped to
  note_range[-1]+0.4 (dcnet/softmax_viterbi.py:375-406).
- msnet/ftanet: 321-class softmax CE with a prepended non-melody class at
  note 0, blurred targets normalized to sum 1
  (msnet/hsieh_m2m3.py:342-377, ftanet/yu.py:280-316).
- jdc: 722-class softmax CE (sigma = 0.9/16 on a 1/16-semitone grid, voiced
  notes clamped into [38-2/16, 83+2/16]) + 0.5 * voicing BCE
  (jdc/kum_m2m3.py:289-341); the l2 regularizer is applied by the trainer.

Note grids:
- dcnet: 23.6 + arange(320)/5 (NSGT bins; fmin = midi 24 / factor^2 = midi
  23.6, dcnet/nsgt.py:73),
- msnet/ftanet: hz_to_midi(cfp central_freqs[1:]) = midi(31 Hz) + (k+1)/5
  (msnet/hsieh_m2m3.py:185-203),
- tonet: hz_to_midi(tonet cfp central_freqs[1:]), 360 bins from 32 Hz,
- jdc: 38 + arange(721)/16 (jdc/kum_m2m3.py:310-312).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

CUTOFF_PROB = 4e-3


def note_grid(note_min: float, n_bins: int, bins_per_semitone: float) -> np.ndarray:
    return (note_min + np.arange(n_bins) / bins_per_semitone).astype(np.float32)


def cfp_note_range(central_freqs: np.ndarray) -> np.ndarray:
    """hz_to_midi of central_freqs[1:] (msnet/hsieh_m2m3.py:185-203)."""
    from ..metrics.mel_eval import hz_to_midi

    return hz_to_midi(np.asarray(central_freqs)[1:]).astype(np.float32)


def _msnet_note_range() -> np.ndarray:
    from ..frontend.cfp import MSNET_CFP

    return cfp_note_range(MSNET_CFP.central_freqs)


def _tonet_note_range() -> np.ndarray:
    from ..frontend.cfp import TONET_CFP

    return cfp_note_range(TONET_CFP.central_freqs)


DCNET_NOTE_RANGE = note_grid(23.6, 320, 5)
JDC_NOTE_RANGE = note_grid(38.0, 721, 16)


@functools.partial(jax.jit, static_argnames=("normalize",))
def gaussian_blur_targets(ref_notes, note_range, sigma, normalize: bool):
    """[T] MIDI notes -> [T, len(note_range)] blurred targets.

    exp(-(note - center)^2 / (2 sigma^2)), zeroed below CUTOFF_PROB, and
    (softmax families) normalized to sum 1 per frame. Callers clip/clamp the
    notes and prepend the non-melody grid entry as appropriate.
    """
    d = ref_notes[:, None] - note_range[None, :]
    t = jnp.exp(-(d**2) / (2.0 * sigma**2))
    t = jnp.where(t < CUTOFF_PROB, 0.0, t)
    if normalize:
        t = t / jnp.sum(t, axis=-1, keepdims=True)
    return t


@jax.jit
def dcnet_loss(ref_notes, logits):
    """Per-bin BCE vs blurred targets (no non-melody class)."""
    note_range = jnp.asarray(DCNET_NOTE_RANGE)
    ref_notes = jnp.minimum(ref_notes.reshape(-1), note_range[-1] + 0.4)
    logits = logits.reshape(-1, note_range.shape[0])
    targets = gaussian_blur_targets(ref_notes, note_range, 0.18, normalize=False)
    loss = _bce_with_logits(targets, logits)
    return jnp.mean(loss)


@jax.jit
def softmax_smoothed_loss(ref_notes, logits):
    """(n_bins+1)-class softmax CE with non-melody class 0 at note 0
    (msnet/ftanet; logits [T, 321] or [..., n_bins+1])."""
    note_range = jnp.asarray(np.pad(_msnet_note_range(), (1, 0)))
    ref_notes = jnp.minimum(ref_notes, note_range[-1] + 0.4)
    targets = gaussian_blur_targets(
        ref_notes.reshape(-1), note_range, 0.18, normalize=True
    )
    logits = logits.reshape(-1, note_range.shape[0])
    loss = -jnp.sum(targets * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    return jnp.mean(loss)


@jax.jit
def tonet_labels(ref_notes):
    """MIDI notes [B, T] -> integer label dict(pitch [0..360], chroma
    [0..12], octave [0..6]) per tonet/main_shaun.py:317-363.

    pitch = index of the first grid note >= ref note (0 = unvoiced);
    octave = (pitch-1)//60 + 1; chroma = (pitch-1)%60//5 + 1; both 0 when
    unvoiced."""
    note_range = jnp.asarray(_tonet_note_range())
    note_min, note_max = note_range[0], note_range[-1]
    positive = ref_notes > 0.0
    notes = jnp.where(positive & (ref_notes < note_min), note_min, ref_notes)
    notes = jnp.where(notes > note_max, note_max, notes)
    grid = jnp.concatenate([jnp.zeros((1,), jnp.float32), note_range])
    ge = (grid[None, None, :] - notes[..., None]) >= 0.0
    pitch = jnp.argmax(ge, axis=-1).astype(jnp.int32)
    octave = jnp.where(positive, (pitch - 1) // 60 + 1, 0)
    chroma = jnp.where(positive, (pitch - 1) % 60 // 5 + 1, 0)
    return dict(pitch=pitch, chroma=chroma, octave=octave)


@jax.jit
def tonet_loss(ref_notes, logits):
    """Mean of 3 cross-entropies on integer pitch/chroma/octave labels
    (tonet/main_shaun.py:298-315). logits: dict of [B, C, T] tensors;
    chroma/octave may be None (the tcfp/single TONet ablations train on
    the pitch CE alone, tonet/model/tonet.py:278-300)."""
    labels = tonet_labels(ref_notes)

    def ce(lg, lb):
        lg = jnp.transpose(lg, (0, 2, 1))  # [B, T, C]
        return -jnp.take_along_axis(
            jax.nn.log_softmax(lg, axis=-1), lb[..., None], axis=-1
        )[..., 0]

    losses = [
        ce(logits[k], labels[k])
        for k in ("pitch", "chroma", "octave")
        if logits.get(k) is not None
    ]
    return jnp.mean(jnp.stack(losses, axis=-1))


@jax.jit
def jdc_loss(ref_notes, pitch_logits, voicing_logits):
    """722-class pitch CE + 0.5 * voicing BCE (jdc/kum_m2m3.py:289-341)."""
    note_range = jnp.asarray(np.pad(JDC_NOTE_RANGE, (1, 0)))
    ref_notes = ref_notes.reshape(-1)
    pitch_logits = pitch_logits.reshape(-1, 722)
    voicing_logits = voicing_logits.reshape(-1)
    ref_voicing = ref_notes > 0.1

    note_min = jnp.float32(38.0 - 2.0 / 16.0)
    note_max = jnp.float32(83.0 + 2.0 / 16.0)
    notes = jnp.where((ref_notes > 0.1) & (ref_notes < note_min), note_min, ref_notes)
    notes = jnp.minimum(notes, note_max)

    targets = gaussian_blur_targets(notes, note_range, 0.9 / 16.0, normalize=True)
    pitch_loss = jnp.mean(
        -jnp.sum(targets * jax.nn.log_softmax(pitch_logits, axis=-1), axis=-1)
    )
    voicing_loss = jnp.mean(
        _bce_with_logits(ref_voicing.astype(jnp.float32), voicing_logits)
    )
    return pitch_loss + 0.5 * voicing_loss


def _bce_with_logits(labels, logits):
    """tf.nn.sigmoid_cross_entropy_with_logits semantics:
    max(x,0) - x*z + log1p(exp(-|x|))."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
