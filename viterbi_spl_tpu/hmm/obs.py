"""Observation models: acoustic-model logits -> HMM observation probabilities.

Vectorized (mask-based, TPU-friendly) re-designs of the reference's
per-frame Python loops:

- "shaun" (the paper's model): local-peak picking with single-side width spw
  + logistic voicing probability; reference dcnet/softmax_viterbi.py:2316-2360
  (spw=5, 320 bins), jdc/viterbi_softmax.py:1959-2003 (spw=16, 721 bins),
  imm/main_imm.py:187-234 (spw=20, 721 bins, log-energy threshold).
- softmax-scaled / softmax-unscaled: softmax over peaks (divided by state
  priors when scaled); reference dcnet/softmax_viterbi.py:2530-2579,
  jdc/viterbi_softmax.py:2131-2176.

All functions are pure jnp (jit/vmap-able); NumPy inputs work through jnp
dispatch. Peak finding uses reflect padding + windowed first-argmax, matching
np.pad(mode='reflect') / first-max argmax semantics of the reference.

Observation probabilities are returned TIME-major [T, S+1] with the unvoiced
state last (the reference returns state-major [S+1, T]; transpose is the
caller's choice — our decoders are time-major).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


def find_peaks(logits: jnp.ndarray, spw: int) -> jnp.ndarray:
    """Boolean peak mask per frame.

    logits: [T, n_bins]. A bin is a peak iff it is the FIRST maximum of the
    window of width 2*spw+1 centred on it (reflect-padded at the edges) —
    i.e. windowed argmax == spw, as in the reference peak finders
    (dcnet/softmax_viterbi.py:2302-2314, imm/main_imm.py:168-184).
    """
    n_bins = logits.shape[-1]
    padded = jnp.pad(logits, [(0, 0), (spw, spw)], mode="reflect")
    # Windowed first-argmax == spw without materializing the [T, n_bins, w]
    # window tensor (it OOMs at serving batch sizes): the centre is the
    # window's FIRST maximum iff it is strictly greater than every entry to
    # its left and >= every entry to its right. Both side maxima are slices
    # of ONE running window-max of width spw, built by shift doubling —
    # ceil(log2(spw)) maximum passes instead of 2*(spw-1), bit-identical
    # (the same elements reduce under associative, exact fp max).
    m, k = padded, 1
    while k < spw:
        s = min(k, spw - k)
        m = jnp.maximum(m[:, : m.shape[1] - s], m[:, s:])
        k += s
    # m[i] = max(padded[i .. i+spw-1])
    left = m[:, 0:n_bins]
    right = m[:, spw + 1 : spw + 1 + n_bins]
    return (logits > left) & (logits >= right)


@functools.partial(jax.jit, static_argnames=("spw",))
def shaun_observation_probs(
    logits: jnp.ndarray,
    threshold: jnp.ndarray | float,
    spw: int,
    p: float = 0.8,
    scale: float = 2.0,
) -> jnp.ndarray:
    """The paper's peak+voicing observation model, fully vectorized.

    logits: [T, n_bins] frame-wise pitch logits (sigmoid logits for dcnet,
    re-referenced softmax logits for msnet/ftanet/tonet, log-energies for imm).
    threshold: voicing threshold in logit/log-energy units.

    Per frame: find peaks; p_voiced = expit(scale*(gmax - th) +/- offset)
    with offset = log(p/(1-p)), sign flipping at gmax >= th; softmax mass over
    peaks scaled to p_voiced; unvoiced state gets 1 - p_voiced; frames with no
    peaks are fully unvoiced. Max-subtracted exponentials (numerically stable;
    mathematically identical to the reference's raw exp).

    Returns [T, n_bins + 1] with unvoiced last; rows sum to 1.
    """
    logits = logits.astype(jnp.float32)
    T, n_bins = logits.shape
    threshold = jnp.asarray(threshold, jnp.float32)
    p = jnp.asarray(p, jnp.float32)
    offset = jnp.log(p / (1.0 - p))
    scale = jnp.asarray(scale, jnp.float32)

    is_peak = find_peaks(logits, spw)
    any_peak = jnp.any(is_peak, axis=1)  # [T]

    peak_logits = jnp.where(is_peak, logits, NEG_INF)
    gmax = jnp.max(peak_logits, axis=1)  # [T]; -inf when no peaks
    sign = jnp.where(gmax >= threshold, 1.0, -1.0).astype(jnp.float32)
    s = scale * (gmax - threshold) + sign * offset
    p_voiced = jax.nn.sigmoid(s)  # == e/(1+e), stable
    p_voiced = jnp.where(any_peak, p_voiced, 0.0)

    # softmax over peaks, scaled so the voiced mass is p_voiced
    exps = jnp.where(is_peak, jnp.exp(logits - gmax[:, None]), 0.0)
    denom = jnp.sum(exps, axis=1, keepdims=True)
    voiced_probs = exps * (p_voiced[:, None] / jnp.maximum(denom, 1e-30))

    unvoiced = (1.0 - p_voiced)[:, None]
    return jnp.concatenate([voiced_probs, unvoiced], axis=1)


@functools.partial(jax.jit, static_argnames=("spw", "scaled"))
def softmax_observation_probs(
    logits: jnp.ndarray,
    voicing_threshold_logit: jnp.ndarray | float,
    init_probs: jnp.ndarray,
    spw: int,
    scaled: bool,
) -> jnp.ndarray:
    """Softmax observation model (the SoftMaxViterbi ablation).

    logits: [T, n_bins] pitch logits already re-referenced to the non-melody
    class where applicable. The non-melody "bin" takes the constant logit
    log(th/(1-th)); it always counts as a peak. Softmax over the peak set,
    then (scaled=True) divided by the state priors (likelihood = posterior /
    prior). Reference: dcnet/softmax_viterbi.py:2530-2579.

    init_probs: [n_bins + 1] priors with unvoiced LAST (our convention; the
    reference rolls them so unvoiced is first internally, then rolls back).
    Returns [T, n_bins + 1] observation weights with unvoiced last. Rows are
    NOT normalized when scaled (only ratios matter to Viterbi).
    """
    logits = logits.astype(jnp.float32)
    T, n_bins = logits.shape
    vth = jnp.asarray(voicing_threshold_logit, jnp.float32)

    if scaled:
        priors = jnp.asarray(init_probs, jnp.float32)  # [n_bins + 1], unvoiced last
    else:
        priors = jnp.ones((n_bins + 1,), jnp.float32)
    prior_unvoiced = priors[-1]
    prior_voiced = priors[:-1]

    is_peak = find_peaks(logits, spw)  # [T, n_bins]

    # softmax over {non-melody logit} ∪ {peak logits}
    peak_logits = jnp.where(is_peak, logits, NEG_INF)
    gmax = jnp.maximum(jnp.max(peak_logits, axis=1), vth)  # non-melody always in set
    exps = jnp.where(is_peak, jnp.exp(logits - gmax[:, None]), 0.0)
    exp_nm = jnp.exp(vth - gmax)  # [T]
    denom = jnp.sum(exps, axis=1) + exp_nm

    voiced = exps / denom[:, None] / prior_voiced[None, :]
    voiced = jnp.where(is_peak, voiced, 0.0)
    unvoiced = (exp_nm / denom) / prior_unvoiced

    # frames with no pitch peaks: all mass on the non-melody state
    any_peak = jnp.any(is_peak, axis=1)
    voiced = jnp.where(any_peak[:, None], voiced, 0.0)
    unvoiced = jnp.where(any_peak, unvoiced, 1.0 / prior_unvoiced)

    return jnp.concatenate([voiced, unvoiced[:, None]], axis=1)


def rereference_softmax_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """Pitch logits re-referenced to the non-melody class.

    For softmax-head models whose class 0 is "non-melody": returns
    logits[:, 1:] - logits[:, :1] (reference msnet/hsieh_m2m3.py:1895,
    ftanet/viterbi_performance.py:2058, jdc/viterbi_softmax.py:2452-2453).
    """
    return logits[:, 1:] - logits[:, :1]
