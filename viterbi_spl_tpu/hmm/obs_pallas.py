"""Fused Pallas TPU kernels for the observation models.

The XLA lowering of `hmm.obs.shaun_observation_probs` runs each windowed-max
/ softmax stage as its own HBM pass over the [N, T, n_bins] tensor (~90 ms
for N=128, T=8192 on v5e — slower than the entire Viterbi decode). This
kernel computes the whole model — peak picking, voicing probability, peak
softmax, unvoiced mass, log — inside VMEM with ONE read of the logits and
ONE write of decoder-ready log-observations (lanes [0, n_bins] populated,
padding lanes at NEG_PAD, exactly the layout the banded/dense forward
kernels consume).

The kernels are DIRECT-log (round 3): instead of materializing the
probability and taking a P-lane log (log(exp(d)*c + TINY)), peak lanes get
d + log(c) floored at log(TINY) — the per-frame log factor is a cheap
[N, L, 1] column. Semantics match hmm.obs.*_observation_probs ->
log(obs + TINY) value-for-value up to (a) floating-point reduction order
in the peak-softmax denominator (a lane-sum), (b) transcendental-
rearrangement ulp (log(a*b) vs log a + log b; measured <= ~1e-4 relative),
and (c) <= log 2 absolute inside the TINY-floor region (log-prob <= ~-80,
where every value is a drowned candidate; measured 0 diff on v5e test
data). Peak masks, gmax, exact-zero lanes (= log TINY), and padding are
bit-identical. Skipping the P-lane log is a 1.47x kernel speedup (17.5 ->
11.9 ms at N=128, T=8192, P=384 on v5e; the copy-kernel HBM floor is
7.8 ms). The fused path remains an opt-in SERVING path
(DecoderSetup(fused_obs=True), decode CLI --fused-obs); the default path
keeps the XLA implementation whose outputs are bit-reproducible across
CPU/TPU backends.

`softmax_log_obs_pallas` fuses the softmax observation model the same way
(one kernel handles scaled and unscaled: the prior division becomes a
no-op against an all-ones prior row). Same tolerance contract.

Reference semantics: dcnet/softmax_viterbi.py:2316-2360 (peak+voicing
observation model), :2302-2314 (vectorized peak finder),
:2530-2579 (softmax-scaled/-unscaled models).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .viterbi import NEG_PAD, TINY
from .viterbi_pallas import _VMEM_LIMIT, _use_interpret

LANE = 128


def pad_logits_reflect(logits: jnp.ndarray, spw: int, P: int) -> jnp.ndarray:
    """[..., T, n_bins] -> [..., T, P] with the reflect-padded window support
    laid out in lanes: [0, spw) reflect prefix, [spw, spw + n_bins) data,
    [spw + n_bins, spw + n_bins + spw) reflect suffix, rest NEG_PAD.
    One XLA pass; everything else happens in the kernel."""
    n_bins = logits.shape[-1]
    assert spw + n_bins + spw <= P
    body = jnp.pad(
        logits.astype(jnp.float32),
        [(0, 0)] * (logits.ndim - 1) + [(spw, spw)],
        mode="reflect",
    )
    return jnp.pad(
        body,
        [(0, 0)] * (logits.ndim - 1) + [(0, P - body.shape[-1])],
        constant_values=NEG_PAD,
    )


def _window_max(x, w: int, P: int, neg: bool, axis: int = 2):
    """max over pltpu.roll(x, j, axis) for j in 0..w-1 (neg: j in -(w-1)..0),
    built by shift doubling: ceil(log2(w))-ish roll+max steps instead of w.
    Exact — the same cyclic roll set reduces under associative fp max."""
    m, k = x, 1
    while k < w:
        s = min(k, w - k)
        m = jnp.maximum(m, pltpu.roll(m, (P - s) if neg else s, axis))
        k += s
    return m


# log(TINY) as the exact numpy-f32 value, the floor every non-peak lane
# carries (bit-equal to np.log(np.float32(0) + TINY))
LOG_TINY_F32 = float(np.log(np.float32(TINY)))


def shaun_log_obs_block(x, n_bins: int, spw: int, P: int,
                        th, offset, scale, *, lane_axis: int):
    """The shaun observation model on one reflect-padded block, DIRECT in
    the log domain: peak lanes get (x - gmax) + log(p_voiced) - log(denom)
    floored at log(TINY); non-peak lanes exactly log(TINY). Equal to
    log(shaun_observation_probs(...) + TINY) up to transcendental-
    rearrangement ulp away from the floor and <= log 2 absolute in the
    TINY-floor region (log-prob <= ~-80) — the round-3 ablation measured
    9.2e-5 max relative and 0 floor-region diff on v5e; skipping the
    P-lane log is a 1.47x kernel speedup (17.5 -> 11.9 ms at N=128,
    T=8192, P=384).

    x: [..., P] with data at lanes [spw, spw + n_bins); lane_axis indexes
    the P axis. Returns the decoder-ready log-obs block (voiced lanes at
    [0, n_bins), unvoiced at lane n_bins, NEG_PAD beyond)."""
    shape = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, lane_axis)
    data = jnp.logical_and(lane >= spw, lane < spw + n_bins)

    # windowed maxima over the reflect-padded lane layout:
    # left = max over rolls 1..spw, right = max over rolls -1..-spw
    left = pltpu.roll(
        _window_max(x, spw, P, neg=False, axis=lane_axis), 1, lane_axis
    )
    right = pltpu.roll(
        _window_max(x, spw, P, neg=True, axis=lane_axis), P - 1, lane_axis
    )
    is_peak = jnp.logical_and(data, jnp.logical_and(x > left, x >= right))

    peak_vals = jnp.where(is_peak, x, NEG_PAD)
    gmax = jnp.max(peak_vals, axis=lane_axis, keepdims=True)
    any_peak = gmax > jnp.float32(NEG_PAD) / 2

    sign = jnp.where(gmax >= th, 1.0, -1.0).astype(jnp.float32)
    s = scale * (gmax - th) + sign * offset
    p_voiced = jnp.where(any_peak, jax.nn.sigmoid(s), 0.0)

    d = x - gmax
    exps = jnp.where(is_peak, jnp.exp(d), 0.0)
    denom = jnp.sum(exps, axis=lane_axis, keepdims=True)

    # per-frame log factor (lane-broadcast): log(p_voiced) - log(denom);
    # the +TINY keeps the no-peak frame finite (everything floors anyway)
    log_c = jnp.log(p_voiced + TINY) - jnp.log(jnp.maximum(denom, 1e-30))
    log_tiny = jnp.float32(LOG_TINY_F32)
    voiced_log = jnp.maximum(d + log_c, log_tiny)
    probs_log = jnp.where(is_peak, voiced_log, log_tiny)

    # shift data lanes back to [0, n_bins); unvoiced state at lane n_bins
    # keeps the exact log(1 - p_voiced + TINY) (a [.., 1] column, cheap)
    shifted = pltpu.roll(probs_log, P - spw, lane_axis)
    uv = jnp.log(1.0 - p_voiced + TINY)
    out = jnp.where(lane == n_bins, uv, shifted)
    return jnp.where(lane <= n_bins, out, jnp.float32(NEG_PAD))


def _make_obs_kernel(n_bins: int, spw: int, N: int, P: int):
    def kernel(params_ref, logits_ref, out_ref):
        # params_ref: SMEM [3] f32 = threshold, offset=log(p/(1-p)), scale
        out_ref[:, :, :] = shaun_log_obs_block(
            logits_ref[:, :, :], n_bins, spw, P,
            params_ref[0], params_ref[1], params_ref[2], lane_axis=2,
        )

    return kernel


def softmax_log_obs_block(x, n_bins: int, spw: int, P: int,
                          vth, prior_uv, log_prior_row, *, lane_axis: int):
    """The softmax observation model on one reflect-padded block, DIRECT in
    the log domain: peak lanes get (x - gmax) - log(denom) - log(prior)
    floored at log(TINY) (the per-lane prior division becomes a lane
    subtraction of the HOST-precomputed log-prior row; zeros when
    unscaled); non-peak lanes exactly log(TINY). Same tolerance contract
    as `shaun_log_obs_block`. The unvoiced state keeps the exact
    exp/denom/prior arithmetic (a [.., 1] column, cheap)."""
    shape = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, lane_axis)
    data = jnp.logical_and(lane >= spw, lane < spw + n_bins)

    left = pltpu.roll(
        _window_max(x, spw, P, neg=False, axis=lane_axis), 1, lane_axis
    )
    right = pltpu.roll(
        _window_max(x, spw, P, neg=True, axis=lane_axis), P - 1, lane_axis
    )
    is_peak = jnp.logical_and(data, jnp.logical_and(x > left, x >= right))

    peak_vals = jnp.where(is_peak, x, NEG_PAD)
    pmax = jnp.max(peak_vals, axis=lane_axis, keepdims=True)
    any_peak = pmax > jnp.float32(NEG_PAD) / 2
    gmax = jnp.maximum(pmax, vth)  # non-melody logit always in the set

    d = x - gmax
    exps = jnp.where(is_peak, jnp.exp(d), 0.0)
    exp_nm = jnp.exp(vth - gmax)  # [.., 1]
    denom = jnp.sum(exps, axis=lane_axis, keepdims=True) + exp_nm

    log_tiny = jnp.float32(LOG_TINY_F32)
    log_denom = jnp.log(denom)
    voiced_log = jnp.maximum(d - log_denom - log_prior_row, log_tiny)
    probs_log = jnp.where(
        jnp.logical_and(is_peak, any_peak), voiced_log, log_tiny
    )
    unvoiced = jnp.where(
        any_peak, (exp_nm / denom) / prior_uv, 1.0 / prior_uv
    )

    shifted = pltpu.roll(probs_log, P - spw, lane_axis)
    out = jnp.where(lane == n_bins, jnp.log(unvoiced + TINY), shifted)
    return jnp.where(lane <= n_bins, out, jnp.float32(NEG_PAD))


def _make_softmax_obs_kernel(n_bins: int, spw: int, N: int, P: int):
    def kernel(params_ref, logits_ref, log_prior_ref, out_ref):
        # params_ref: SMEM [2] f32 = voicing-threshold logit (the constant
        # non-melody logit, always in the softmax set), prior_unvoiced.
        # log_prior_ref: [1, P] log priors in the padded (pre-roll-back)
        # lane layout, zeros when unscaled
        out_ref[:, :, :] = softmax_log_obs_block(
            logits_ref[:, :, :], n_bins, spw, P,
            params_ref[0], params_ref[1],
            log_prior_ref[0, :][None, None, :], lane_axis=2,
        )

    return kernel


@functools.lru_cache(maxsize=32)
def _build_softmax_obs_call(
    n_bins: int, spw: int, N: int, P: int, T_pad: int, block_frames: int,
    interpret: bool,
):
    n_chunks = T_pad // block_frames
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((N, block_frames, P), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, block_frames, P), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[],
    )
    call = pl.pallas_call(
        _make_softmax_obs_kernel(n_bins, spw, N, P),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, T_pad, P), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )

    @jax.jit
    def run(params, logits_padded, prior_row):
        return call(params, logits_padded, prior_row)[0]

    return run


def softmax_log_obs_pallas(
    logits_padded,
    n_bins: int,
    spw: int,
    voicing_threshold_logit,
    init_probs,
    scaled: bool,
    *,
    block_frames: int = 32,
    interpret: bool | None = None,
):
    """Fused softmax observation model (scaled and unscaled): reflect-padded
    logits [N, T_pad, P] (from `pad_logits_reflect`) -> log observations
    [N, T_pad, P], voiced lanes [0, n_bins), unvoiced at lane n_bins,
    NEG_PAD beyond. Semantics of hmm.obs.softmax_observation_probs ->
    log(obs + TINY), same tolerance contract as `shaun_log_obs_pallas`.

    init_probs: [n_bins + 1] priors (unvoiced LAST); ignored when
    scaled=False (the prior division runs against ones).

    Measured tolerance vs the XLA path (direct-log formulation): rtol
    <= ~2e-4 away from the TINY floor, <= log 2 absolute inside it (module
    docstring); decoded paths match exactly on tie-free data (tests +
    on-chip parity check)."""
    if interpret is None:
        interpret = _use_interpret()
    N, T_pad, P = logits_padded.shape
    assert N % 8 == 0 and T_pad % block_frames == 0 and P % LANE == 0

    log_prior_row = np.zeros((1, P), np.float32)
    prior_uv = 1.0
    if scaled:
        pri = np.asarray(init_probs, np.float32)
        assert pri.shape == (n_bins + 1,)
        # log priors live in the padded (pre-roll-back) lane layout,
        # aligned with the data lanes the peak exps occupy
        log_prior_row[0, spw : spw + n_bins] = np.log(pri[:n_bins])
        prior_uv = float(pri[n_bins])
    params = jnp.asarray(
        [float(voicing_threshold_logit), prior_uv], jnp.float32
    )
    run = _build_softmax_obs_call(
        n_bins, spw, N, P, T_pad, block_frames, bool(interpret)
    )
    return run(params, jnp.asarray(logits_padded), jnp.asarray(log_prior_row))


@functools.lru_cache(maxsize=32)
def _build_obs_call(
    n_bins: int, spw: int, N: int, P: int, T_pad: int, block_frames: int,
    interpret: bool,
):
    n_chunks = T_pad // block_frames
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((N, block_frames, P), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, block_frames, P), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[],
    )
    call = pl.pallas_call(
        _make_obs_kernel(n_bins, spw, N, P),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, T_pad, P), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )

    @jax.jit
    def run(params, logits_padded):
        return call(params, logits_padded)[0]

    return run


def shaun_log_obs_pallas(
    logits_padded,
    n_bins: int,
    spw: int,
    threshold,
    p: float = 0.8,
    scale: float = 2.0,
    *,
    block_frames: int = 32,
    interpret: bool | None = None,
):
    """Fused observation model: reflect-padded logits [N, T_pad, P] (from
    `pad_logits_reflect`) -> log observations [N, T_pad, P] with voiced
    log-probs at lanes [0, n_bins), the unvoiced state at lane n_bins, and
    NEG_PAD beyond — directly consumable by the batched forward kernels."""
    if interpret is None:
        interpret = _use_interpret()
    N, T_pad, P = logits_padded.shape
    assert N % 8 == 0 and T_pad % block_frames == 0 and P % LANE == 0
    # offset computed exactly as hmm.obs.shaun_observation_probs does
    # (f32 jnp ops), so the voicing probability stays bit-identical
    p32 = jnp.asarray(p, jnp.float32)
    params = jnp.stack(
        [
            jnp.asarray(threshold, jnp.float32),
            jnp.log(p32 / (1.0 - p32)),
            jnp.asarray(scale, jnp.float32),
        ]
    )
    run = _build_obs_call(
        n_bins, spw, N, P, T_pad, block_frames, bool(interpret)
    )
    return run(params, jnp.asarray(logits_padded))
