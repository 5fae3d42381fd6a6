"""Fused Pallas TPU kernels for the observation models.

The XLA lowering of `hmm.obs.shaun_observation_probs` runs each windowed-max
/ softmax stage as its own HBM pass over the [N, T, n_bins] tensor (~90 ms
for N=128, T=8192 on v5e — slower than the entire Viterbi decode). This
kernel computes the whole model — peak picking, voicing probability, peak
softmax, unvoiced mass, log — inside VMEM with ONE read of the logits and
ONE write of decoder-ready log-observations (lanes [0, n_bins] populated,
padding lanes at NEG_PAD, exactly the layout the banded/dense forward
kernels consume).

Semantics match hmm.obs.shaun_observation_probs -> log(obs + TINY)
value-for-value up to (a) floating-point reduction order in the peak-softmax
denominator (a lane-sum; Mosaic and XLA may reduce in different orders) and
(b) ulp-level transcendental differences (XLA/Mosaic evaluate exp/sigmoid
through shape-dependent code paths). Peak masks, gmax, and exact zeros are
bit-identical. The fused
path is therefore an opt-in SERVING path (DecoderSetup(fused_obs=True),
decode CLI --fused-obs); the default path keeps the XLA implementation
whose outputs are bit-reproducible across CPU/TPU backends.

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


def _window_max(x, w: int, P: int, neg: bool):
    """max over pltpu.roll(x, j, 2) for j in 0..w-1 (neg: j in -(w-1)..0),
    built by shift doubling: ceil(log2(w))-ish roll+max steps instead of w.
    Exact — the same cyclic roll set reduces under associative fp max."""
    m, k = x, 1
    while k < w:
        s = min(k, w - k)
        m = jnp.maximum(m, pltpu.roll(m, (P - s) if neg else s, 2))
        k += s
    return m


def _make_obs_kernel(n_bins: int, spw: int, N: int, P: int):
    LOG_TINY_ADD = TINY  # added before the log, as in the jnp path

    def kernel(params_ref, logits_ref, out_ref):
        # params_ref: SMEM [3] f32 = threshold, offset=log(p/(1-p)), scale
        th = params_ref[0]
        offset = params_ref[1]
        scale = params_ref[2]
        x = logits_ref[:, :, :]  # [N, L, P]; data at lanes [spw, spw+n_bins)
        _, L, _ = x.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, (N, L, P), 2)
        data = jnp.logical_and(lane >= spw, lane < spw + n_bins)

        # windowed maxima over the reflect-padded lane layout:
        # left = max over rolls 1..spw, right = max over rolls -1..-spw
        left = pltpu.roll(_window_max(x, spw, P, neg=False), 1, 2)
        right = pltpu.roll(_window_max(x, spw, P, neg=True), P - 1, 2)
        is_peak = jnp.logical_and(data, jnp.logical_and(x > left, x >= right))

        peak_vals = jnp.where(is_peak, x, NEG_PAD)
        gmax = jnp.max(peak_vals, axis=2, keepdims=True)  # [N, L, 1]
        any_peak = gmax > jnp.float32(NEG_PAD) / 2

        sign = jnp.where(gmax >= th, 1.0, -1.0).astype(jnp.float32)
        s = scale * (gmax - th) + sign * offset
        p_voiced = jax.nn.sigmoid(s)
        p_voiced = jnp.where(any_peak, p_voiced, 0.0)

        exps = jnp.where(is_peak, jnp.exp(x - gmax), 0.0)
        denom = jnp.sum(exps, axis=2, keepdims=True)
        voiced = exps * (p_voiced / jnp.maximum(denom, 1e-30))

        # shift data lanes back to [0, n_bins), put 1-p_voiced at lane n_bins
        probs = pltpu.roll(voiced, P - spw, 2)
        probs = jnp.where(lane == n_bins, 1.0 - p_voiced, probs)
        probs = jnp.where(lane <= n_bins, probs, 0.0)
        log_obs = jnp.log(probs + LOG_TINY_ADD)
        out_ref[:, :, :] = jnp.where(
            lane <= n_bins, log_obs, jnp.float32(NEG_PAD)
        )

    return kernel


def _make_softmax_obs_kernel(n_bins: int, spw: int, N: int, P: int):
    def kernel(params_ref, logits_ref, prior_ref, out_ref):
        # params_ref: SMEM [2] f32 = voicing-threshold logit (the constant
        # non-melody logit, always in the softmax set), prior_unvoiced
        vth = params_ref[0]
        prior_uv = params_ref[1]
        x = logits_ref[:, :, :]  # [N, L, P]; data at lanes [spw, spw+n_bins)
        _, L, _ = x.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, (N, L, P), 2)
        data = jnp.logical_and(lane >= spw, lane < spw + n_bins)

        left = pltpu.roll(_window_max(x, spw, P, neg=False), 1, 2)
        right = pltpu.roll(_window_max(x, spw, P, neg=True), P - 1, 2)
        is_peak = jnp.logical_and(data, jnp.logical_and(x > left, x >= right))

        peak_vals = jnp.where(is_peak, x, NEG_PAD)
        pmax = jnp.max(peak_vals, axis=2, keepdims=True)  # [N, L, 1]
        any_peak = pmax > jnp.float32(NEG_PAD) / 2
        gmax = jnp.maximum(pmax, vth)  # non-melody logit always in the set

        exps = jnp.where(is_peak, jnp.exp(x - gmax), 0.0)
        exp_nm = jnp.exp(vth - gmax)  # [N, L, 1]
        denom = jnp.sum(exps, axis=2, keepdims=True) + exp_nm
        # two divisions, matching hmm.obs.softmax_observation_probs ulp
        # behavior (prior_ref holds the prior itself, ones when unscaled)
        voiced = exps / denom / prior_ref[0, :][None, None, :]
        voiced = jnp.where(jnp.logical_and(is_peak, any_peak), voiced, 0.0)
        unvoiced = jnp.where(
            any_peak, (exp_nm / denom) / prior_uv, 1.0 / prior_uv
        )

        # shift data lanes back to [0, n_bins), unvoiced state at lane n_bins
        probs = pltpu.roll(voiced, P - spw, 2)
        probs = jnp.where(lane == n_bins, unvoiced, probs)
        probs = jnp.where(lane <= n_bins, probs, 0.0)
        log_obs = jnp.log(probs + TINY)
        out_ref[:, :, :] = jnp.where(
            lane <= n_bins, log_obs, jnp.float32(NEG_PAD)
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

    Measured tolerance vs the XLA path: rtol <= 2e-5 in interpret mode,
    <= 5e-5 on v5e (Mosaic exp/log ulp differences); decoded paths match
    exactly on tie-free data (tests + on-chip parity check)."""
    if interpret is None:
        interpret = _use_interpret()
    N, T_pad, P = logits_padded.shape
    assert N % 8 == 0 and T_pad % block_frames == 0 and P % LANE == 0
    import numpy as np

    prior_row = np.ones((1, P), np.float32)
    prior_uv = 1.0
    if scaled:
        pri = np.asarray(init_probs, np.float32)
        assert pri.shape == (n_bins + 1,)
        # priors live in the padded (pre-roll-back) lane layout, aligned
        # with the data lanes the peak exps occupy
        prior_row[0, spw : spw + n_bins] = pri[:n_bins]
        prior_uv = float(pri[n_bins])
    params = jnp.asarray(
        [float(voicing_threshold_logit), prior_uv], jnp.float32
    )
    run = _build_softmax_obs_call(
        n_bins, spw, N, P, T_pad, block_frames, bool(interpret)
    )
    return run(params, jnp.asarray(logits_padded), jnp.asarray(prior_row))


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
