"""Exact banded fast path for the batched Viterbi forward pass.

Every shaped melody transition matrix (SURVEY.md §2.4) has the structure

    A[i, j] = banded Toeplitz-ish voiced block (|i-j| <= d_max, all > 0)
    A[i, n]   = c_vu           (voiced -> unvoiced, constant)
    A[n, j]   = c_uv           (unvoiced -> voiced, constant)
    A[n, n]   = c_uu           (n = n_bins, the unvoiced state)
    A elsewhere = exactly 0  -> log(0 + tiny) = LOG_TINY, a constant.

The dense max over sources then decomposes EXACTLY (bitwise — fp addition
is monotone and the constant adds commute with max) into:

    max( in-band candidates  (2 d_max + 1 lane-rolled adds),
         T1[unvoiced] + log c_uv,
         out-of-band floor:  GLOBAL_voiced_max + LOG_TINY )

The global-max floor is exact even though it over-covers in-band sources:
when the global argmax a lies inside the band of target s,
f32(T1[a] + LOG_TINY) <= f32(T1[a] + band[a-s]) <= C_inband(s) by fp-add
monotonicity (band log-probs >= LOG_TINY), so the extra candidate never
changes the max; when a is out of band, the global max IS the out-of-band
max. Work per frame drops from O(P^2) to O(P (2 d_max + 1)) — while the
forward values stay bit-identical to the dense kernel, so the backtrace
yields bit-identical paths.

Source-profile classes (the v4 formulation, see extract_band_classes)
shrink the in-band work further: because the shaping pipeline pools counts
by |d| and row-normalizes, log A[x, x-d] as a function of the SOURCE x is
the SAME f32 vector for many offsets d. One pre-added vector
h[x] = fl(T1[x] + profile[x]) then serves a whole class of offsets via
lane rolls, and a class whose profile is pointwise-dominated by every
offset between its extremes collapses into a single O(log w)
shift-doubling window max (each window element is either the exact dense
sum for its offset, or a value <= the true candidate another class
computes — so the overall max is unchanged, bitwise).

Negative result (measured on v5e, kept for the record): a "banded
backtrace" that reconstructs FULL backpointer rows per frame from the
banded structure (exact, frame-parallel) is ~3x SLOWER than the dense
backtrace's per-track dynamic logB row loads at production N — computing
all P lanes of every bp row costs about as much as a forward step, while
the dense chase only ever needs one lane per track.

The production backtrace here (`viterbi_backtrace_pallas_banded_batch`)
takes a third route: chase sequentially like the dense backtrace, but
RECONSTRUCT each track's needed logB row in lane space instead of
dynamically loading it. Because log B[s, x] = log(A[x, s] + tiny) =
pf_{x-s}[x] (the source profiles above, lane-indexed by the SOURCE x),
the row for target s is a handful of elementwise selects on the lane
offset e = x - s:

    row[x] = bv[class(e)][x]      for |e| <= d_max   (in-band)
             LOG_TINY             for |e| >  d_max   (out of band)
             log_c_uv             at x = n_bins      (unvoiced source)
             NEG_PAD              at pad lanes
    row      = logB[n_bins, :]    when s is the unvoiced state

— all f32-bitwise equal to the dense logB row (profiles are the same
np.log(A+tiny) values; classes merge only f32-identical profiles), so the
max + first-max argmin over `t1m1_row + row` is bit-identical to the
dense backtrace and to the oracle. This removes the N-per-frame dynamic
row loads (the latency-bound part of the dense chase) entirely.

`extract_banded_structure` validates the structure on the host and returns
None when it does not hold (imm's analytic matrix, random test matrices),
in which case callers fall back to the dense kernel.

Reference semantics anchor: dcnet/tf_viterbi_decoding.py:156-207.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .viterbi import NEG_PAD, TINY
from .viterbi_pallas import GROUP, _VMEM_LIMIT, _use_interpret

LOG_TINY = float(np.log(TINY))
LANE_UV = 128  # lane width of the broadcast unvoiced-carry scratch


@dataclasses.dataclass(frozen=True)
class BandedStructure:
    d_max: int
    n_bins: int
    S: int  # n_bins + 1
    P: int  # padded lanes
    band: np.ndarray  # [2*d_max+1, P] f32: band[d + d_max][s] = log A[s+d, s]
    log_c_uv: float  # log(A[n, j] + tiny)  (unvoiced -> voiced)
    log_c_vu: float  # log(A[i, n] + tiny)  (voiced -> unvoiced)
    log_c_uu: float  # log(A[n, n] + tiny)
    # source-profile classes (see extract_band_classes): each entry is
    # (offsets, kind, d_lo, d_hi) with kind 'win' (one shift-doubling
    # window max over [d_lo, d_hi]) or 'rolls' (one lane roll + max per
    # offset), all sharing one pre-added vector h = T1 + bv[class].
    classes: tuple = ()
    bv: np.ndarray | None = None  # [len(classes), P] f32 source profiles


def extract_banded_structure(A: np.ndarray, pad_to: int) -> BandedStructure | None:
    """Detect the banded+constant-coupling structure; None if absent."""
    A = np.asarray(A, np.float32)
    S = A.shape[0]
    n = S - 1
    if S < 3 or A.shape != (S, S):
        return None
    if not (np.all(A[:n, n] == A[0, n]) and np.all(A[n, :n] == A[n, 0])):
        return None
    voiced = A[:n, :n]
    i, j = np.ogrid[:n, :n]
    nz = voiced != 0
    if not nz.any():
        return None
    d_abs = np.abs(j - i)
    d_max = int(d_abs[nz].max())
    if d_max >= n - 1:
        return None  # effectively dense
    if np.any(voiced[d_abs > d_max] != 0.0):
        return None
    if np.any(voiced[d_abs <= d_max] == 0.0):
        return None  # zeros inside the band would break the floor identity

    P = pad_to
    band = np.full((2 * d_max + 1, P), NEG_PAD, np.float32)
    for d in range(-d_max, d_max + 1):
        # band row holds log A[s+d, s] at lane s (the TRANSPOSED direction)
        s = np.arange(n)
        src = s + d
        ok = (src >= 0) & (src < n)
        vals = np.full(n, NEG_PAD, np.float32)
        vals[ok] = np.log(voiced[src[ok], s[ok]] + TINY)
        band[d + d_max, :n] = vals
    classes, bv = extract_band_classes(band, d_max, n, P)
    return BandedStructure(
        d_max=d_max,
        n_bins=n,
        S=S,
        P=P,
        band=band,
        log_c_uv=float(np.log(A[n, 0] + TINY)),
        log_c_vu=float(np.log(A[0, n] + TINY)),
        log_c_uu=float(np.log(A[n, n] + TINY)),
        classes=classes,
        bv=bv,
    )


def _doubling_stages(w: int) -> int:
    stages, cover = 0, 1
    while cover < w:
        cover += min(cover, w - cover)
        stages += 1
    return stages


def extract_band_classes(
    band: np.ndarray, d_max: int, n: int, P: int
) -> tuple[tuple, np.ndarray]:
    """Partition band offsets into source-profile classes and pick each
    class's cheapest exact execution strategy.

    A per-offset source profile is pf_d[x] = band[d + d_max][x - d]
    (= log A[x, x-d], NaN where x is not a valid source). The shaping
    pipeline pools transition counts by distance and floors small counts
    (SURVEY.md §2.4), then normalizes each row by Z_x, so pf_d[x] =
    log(c(|d|)/Z_x + tiny) depends on d only through the pooled count —
    ±d pairs share one exact f32 profile, and every |d| in the floored
    tail shares the SAME profile. Offsets whose profiles are f32-identical
    on their common domain merge into one class with a merged profile.

    Strategies over h[x] = fl(T1[x] + profile[x]):
      'rolls' — one lane roll + max per offset (cost 1 + 2k, k offsets;
                offset 0 needs no roll);
      'win'   — one shift-doubling window max over the span
                [d_lo, d_hi] = [min(offsets), max(offsets)]
                (cost ~3 + 2 ceil-log2(w)). Exact iff every offset d' in
                the span that is NOT in the class has pf_{d'} >= profile
                pointwise on the common domain: then each spurious window
                element is <= the true candidate that d''s own class
                computes (fp-add monotonicity), so the overall max over
                all classes is unchanged, bitwise.

    Returns (classes, bv): classes a tuple of (offsets, kind, d_lo, d_hi),
    bv a [len(classes), P] f32 array of profiles (NEG_PAD where x is never
    a valid source for the class).
    """
    profiles = np.full((2 * d_max + 1, P), np.nan, np.float32)
    for d in range(-d_max, d_max + 1):
        s = np.arange(max(0, -d), min(n, n - d))  # valid targets
        profiles[d + d_max, s + d] = band[d + d_max, s]

    # greedy partition by exact f32 equality on the common valid domain
    class_offsets: list[list[int]] = []
    class_profiles: list[np.ndarray] = []
    for d in range(-d_max, d_max + 1):
        pf = profiles[d + d_max]
        placed = False
        for ci, cp in enumerate(class_profiles):
            both = ~np.isnan(cp) & ~np.isnan(pf)
            if both.any() and np.array_equal(cp[both], pf[both]):
                new = np.isnan(cp) & ~np.isnan(pf)
                cp[new] = pf[new]
                class_offsets[ci].append(d)
                placed = True
                break
        if not placed:
            class_offsets.append([d])
            class_profiles.append(pf.copy())

    classes: list[tuple] = []
    bvs: list[np.ndarray] = []
    for offsets, cp in zip(class_offsets, class_profiles):
        d_lo, d_hi = min(offsets), max(offsets)
        w = d_hi - d_lo + 1
        cost_rolls = 1 + sum(1 if d == 0 else 2 for d in offsets)
        cost_win = 2 + (1 if d_lo != 0 else 0) + 2 * _doubling_stages(w)
        win_ok = cost_win < cost_rolls
        if win_ok:
            # domination check for span offsets outside the class
            member = set(offsets)
            for d2 in range(d_lo, d_hi + 1):
                if d2 in member:
                    continue
                pf2 = profiles[d2 + d_max]
                both = ~np.isnan(cp) & ~np.isnan(pf2)
                if not np.all(pf2[both] >= cp[both]):
                    win_ok = False
                    break
        kind = "win" if win_ok else "rolls"
        classes.append((tuple(offsets), kind, d_lo, d_hi))
        out = np.full(P, NEG_PAD, np.float32)
        ok = ~np.isnan(cp)
        out[ok] = cp[ok]
        bvs.append(out)
    bv_arr = np.stack(bvs) if bvs else np.zeros((0, P), np.float32)
    return tuple(classes), bv_arr


def _make_banded_forward_kernel(bs_key: tuple, N: int):
    (d_max, n_bins, S, P, log_c_uv, log_c_vu, log_c_uu, classes, singles,
     ragged, obs_mode) = bs_key

    def kernel(*refs):
        # obs_mode=None: refs = (obs, band, bv, logpi, len | outs/scratch).
        # obs_mode=(method, spw): a scalar-prefetch params ref leads and a
        # log-prior row follows; the obs input carries REFLECT-PADDED RAW
        # LOGITS and each GROUP's log observations are computed in-kernel
        # (hmm/obs_pallas.py block helpers) — one [N, T, P] HBM round trip
        # less than the two-kernel serving chain
        if obs_mode is None:
            (obs_ref, band_ref, bv_ref, logpi_ref, len_ref,
             t1m1_ref, t1_last_ref, carry, carry_uv) = refs
            params_ref = logprior_ref = None
        else:
            (params_ref, obs_ref, band_ref, bv_ref, logpi_ref, len_ref,
             logprior_ref, t1m1_ref, t1_last_ref, carry, carry_uv) = refs

        def obs_block(j0, G):
            """log observations for frames [j0, j0+G) of this chunk."""
            blk = obs_ref[:, pl.ds(j0, G), :]
            if obs_mode is None:
                return blk
            from .obs_pallas import (
                shaun_log_obs_block,
                softmax_log_obs_block,
            )

            method, spw = obs_mode
            if method == "shaun":
                return shaun_log_obs_block(
                    blk, n_bins, spw, P,
                    params_ref[0], params_ref[1], params_ref[2],
                    lane_axis=2,
                )
            return softmax_log_obs_block(
                blk, n_bins, spw, P,
                params_ref[0], params_ref[1],
                logprior_ref[0, :][None, None, :], lane_axis=2,
            )

        chunk = pl.program_id(0)
        _, L, _ = obs_ref.shape
        base_t = chunk * L
        lane = jax.lax.broadcasted_iota(jnp.int32, (N, P), 1)
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        lengths = len_ref[:, :]  # [N, 1] int32 (VMEM column input)
        logpi_row = logpi_ref[0, :][None, :]
        # the unvoiced-state carry column avoids a per-frame lane extraction
        # (a where + lane reduce); these one-time extractions are exact
        logpi_uv = jnp.max(
            jnp.where(lane_row == n_bins, logpi_row, NEG_PAD),
            axis=1, keepdims=True,
        )  # [1, 1]

        def step_max(prev, prev_uv):
            """One banded max-plus step (pre-obs). Per-class candidates
            reduce in a BALANCED tree: ~9 live [N, P] tensors (the round-1
            per-OFFSET tree kept ~31 and spilled), and the critical path
            shrinks from len(classes) sequential maxes to log2."""
            voiced_prev = jnp.where(lane < n_bins, prev, NEG_PAD)
            max_voiced = jnp.max(voiced_prev, axis=1, keepdims=True)
            # out-of-band floor via the GLOBAL voiced max (exact; module
            # doc) and the unvoiced source, folded into one [N, 1] seed
            seed = jnp.maximum(max_voiced + LOG_TINY, prev_uv + log_c_uv)
            cands = [jnp.broadcast_to(seed, (N, P))]
            for ci, (offsets, kind, d_lo, d_hi) in enumerate(classes):
                h = voiced_prev + bv_ref[ci, :][None, :]
                if kind == "win":
                    # shift-doubling window max: m[s] = max h[s+d_lo..s+d_hi]
                    m = pltpu.roll(h, (-d_lo) % P, 1) if d_lo else h
                    cover, w = 1, d_hi - d_lo + 1
                    while cover < w:
                        sft = min(cover, w - cover)
                        m = jnp.maximum(m, pltpu.roll(m, (P - sft) % P, 1))
                        cover += sft
                    cands.append(m)
                else:
                    for d in offsets:
                        cands.append(pltpu.roll(h, (-d) % P, 1) if d else h)
            # fallback path (wrap-unsafe padding): per-offset target-masked
            # band rows, no source profiles
            for d in singles:
                shifted = pltpu.roll(prev, (-d) % P, 1)  # shifted[s] = prev[s+d]
                cands.append(shifted + band_ref[d + d_max, :][None, :])
            while len(cands) > 1:
                cands = [
                    jnp.maximum(cands[i], cands[i + 1])
                    if i + 1 < len(cands) else cands[i]
                    for i in range(0, len(cands), 2)
                ]
            acc = cands[0]
            # unvoiced target
            m_uv = jnp.maximum(max_voiced + log_c_vu, prev_uv + log_c_uu)
            # pad lanes (> n_bins) receive acc ~= seed + pad-obs each frame;
            # they never win any downstream argmax (obs pads are -1e30), so
            # no extra mask is spent on them
            m = jnp.where(lane == n_bins, m_uv, acc)
            return m, m_uv

        # frame 0 is handled OUTSIDE the hot loop: the carry is
        # pre-initialized to T1[0] = log pi + obs[0], so the per-frame
        # update needs no is_first select at all
        @pl.when(chunk == 0)
        def _():
            obs0 = obs_block(0, 1)[:, 0, :]
            carry[:, :] = logpi_row + obs0
            lane0 = jax.lax.broadcasted_iota(jnp.int32, (N, P), 1)
            obs0_uv = jnp.max(
                jnp.where(lane0 == n_bins, obs0, NEG_PAD), axis=1,
                keepdims=True,
            )
            carry_uv[:, :] = jnp.broadcast_to(
                logpi_uv + obs0_uv, carry_uv.shape
            )

        # static Python loop: frame offsets j are Python ints, so the
        # full-length specialization needs no per-frame masks at all — the
        # single chunk-dependent select sits on frame j == 0 of each chunk
        prev = carry[:, :]
        prev_uv = jnp.max(carry_uv[:, :], axis=1, keepdims=True)  # equal lanes
        for g in range(L // GROUP):
            j0 = g * GROUP
            obs_blk = obs_block(j0, GROUP)
            # static lane slice of the unvoiced observation column —
            # bitwise the same values as a where+reduce extraction
            obs_uv_blk = obs_blk[:, :, n_bins : n_bins + 1]  # [N, GROUP, 1]
            rows = []
            for k in range(GROUP):
                j = j0 + k  # static within-chunk frame index
                obs_j = obs_blk[:, k, :]
                obs_uv_j = obs_uv_blk[:, k, :]  # [N, 1]
                rows.append(prev)
                m, m_uv = step_max(prev, prev_uv)
                if ragged:
                    # frame t > 0 advances tracks still active; frame 0
                    # keeps the pre-initialized carry
                    t = base_t + j
                    step = jnp.logical_and(t > 0, t < lengths)  # [N, 1]
                    prev = jnp.where(step, m + obs_j, prev)
                    prev_uv = jnp.where(step, m_uv + obs_uv_j, prev_uv)
                elif j == 0:
                    keep = chunk == 0  # frame 0 keeps the pre-init carry
                    prev = jnp.where(keep, prev, m + obs_j)
                    prev_uv = jnp.where(keep, prev_uv, m_uv + obs_uv_j)
                else:
                    prev = m + obs_j
                    prev_uv = m_uv + obs_uv_j
            t1m1_ref[:, pl.ds(j0, GROUP), :] = jnp.stack(rows, axis=1)
        carry[:, :] = prev
        carry_uv[:, :] = jnp.broadcast_to(prev_uv, carry_uv.shape)

        @pl.when(chunk == 0)
        def _():
            # t1m1 row 0 is T1[-1]: zeros by contract (unused by backtrace)
            blk0 = t1m1_ref[:, 0:GROUP, :]
            row_i = jax.lax.broadcasted_iota(jnp.int32, (N, GROUP, P), 1)
            t1m1_ref[:, 0:GROUP, :] = jnp.where(row_i == 0, 0.0, blk0)

        @pl.when(chunk == pl.num_programs(0) - 1)
        def _():
            t1_last_ref[:, :] = prev

    return kernel


@functools.lru_cache(maxsize=32)
def _build_banded_call(
    key: tuple,
    N: int,
    T_pad: int,
    block_frames: int,
    interpret: bool,
):
    """Jitted pallas call cached per (structure scalars+classes, shapes)."""
    (d_max, n_bins, S, P, log_c_uv, log_c_vu, log_c_uu, classes, singles,
     ragged, obs_mode) = key
    n_chunks = T_pad // block_frames
    W = 2 * d_max + 1
    n_bv = max(len(classes), 1)  # zero-sized VMEM blocks are not tileable
    # rough VPU-op cost per frame, for the compiler's pipeline model
    ops = 12 + 3 * len(singles)
    for offsets, kind, d_lo, d_hi in classes:
        if kind == "win":
            ops += 3 + 2 * _doubling_stages(d_hi - d_lo + 1)
        else:
            ops += 1 + sum(1 if d == 0 else 2 for d in offsets)
    if obs_mode is not None:
        ops += 25  # in-kernel observation model (rolls + exp + selects)

    in_specs = [
        pl.BlockSpec((N, block_frames, P), lambda i, *_: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((W, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_bv, P), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N, 1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
    ]
    if obs_mode is not None:
        in_specs.append(
            pl.BlockSpec((1, P), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0 if obs_mode is None else 1,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((N, block_frames, P), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, P), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, P), jnp.float32),
            pltpu.VMEM((N, LANE_UV), jnp.float32),
        ],
    )
    call = pl.pallas_call(
        _make_banded_forward_kernel(key, N),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, T_pad, P), jnp.float32),
            jax.ShapeDtypeStruct((N, P), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=ops * N * T_pad * P, bytes_accessed=N * T_pad * P * 8,
            transcendentals=0 if obs_mode is None else N * T_pad * P,
        ),
    )

    if obs_mode is None:

        @jax.jit
        def run(lengths, obs_batch, band, bv, log_pi):
            t1m1, t1_last = call(
                obs_batch.astype(jnp.float32),
                band,
                bv,
                log_pi.astype(jnp.float32)[None, :],
                lengths.astype(jnp.int32)[:, None],
            )
            return t1_last, t1m1

    else:

        @jax.jit
        def run(lengths, logits_padded, band, bv, log_pi, obs_params,
                log_prior_row):
            t1m1, t1_last = call(
                obs_params.astype(jnp.float32),
                logits_padded.astype(jnp.float32),
                band,
                bv,
                log_pi.astype(jnp.float32)[None, :],
                lengths.astype(jnp.int32)[:, None],
                log_prior_row.astype(jnp.float32),
            )
            return t1_last, t1m1

    return run


def viterbi_forward_pallas_banded_batch(
    bs: BandedStructure,
    log_pi,
    obs_batch,
    lengths,
    *,
    block_frames: int = 128,
    interpret: bool | None = None,
):
    """Banded batched forward DP; same contract as
    viterbi_forward_pallas_batch (T1 values bit-identical on lanes [:S];
    pad lanes hold garbage that never wins an argmax)."""
    if interpret is None:
        interpret = _use_interpret()
    N, T_pad, P = obs_batch.shape
    assert P == bs.P and N % 8 == 0 and T_pad % block_frames == 0
    classes, singles = bs.classes, ()
    # the profile formulation masks wrapped lanes by SOURCE, which is only
    # safe when rolls cannot wrap valid sources onto valid targets
    if classes and P < bs.n_bins + bs.d_max:
        classes, singles = (), tuple(range(-bs.d_max, bs.d_max + 1))
    if isinstance(lengths, jax.core.Tracer):
        # called under an outer jit: lengths are unknown at trace time, so
        # build the (always-correct) ragged specialization
        ragged = True
    else:
        # host-side peek WITHOUT a device round trip: lengths is usually a
        # NumPy array here (free), and np.asarray on a device array is one
        # D2H copy — never stage an H2D transfer just to read it back
        lengths_np = np.asarray(lengths)
        ragged = bool(np.any(lengths_np != T_pad))
    key = (
        bs.d_max, bs.n_bins, bs.S, bs.P,
        bs.log_c_uv, bs.log_c_vu, bs.log_c_uu, classes, singles, ragged,
        None,
    )
    bv = bs.bv if (bs.bv is not None and len(classes)) else None
    if bv is None or bv.shape[0] == 0:
        bv = np.zeros((1, P), np.float32)
    run = _build_banded_call(key, N, T_pad, block_frames, bool(interpret))
    return run(
        jnp.asarray(lengths, jnp.int32),
        jnp.asarray(obs_batch),
        jnp.asarray(bs.band),
        jnp.asarray(bv),
        jnp.asarray(log_pi),
    )


def viterbi_forward_pallas_banded_batch_obs(
    bs: BandedStructure,
    log_pi,
    logits_padded,
    lengths,
    obs: dict,
    *,
    block_frames: int = 128,
    interpret: bool | None = None,
):
    """Banded batched forward DP with the OBSERVATION MODEL FUSED IN: the
    input is reflect-padded raw logits (hmm.obs_pallas.pad_logits_reflect
    layout) and each block's log observations are computed inside the
    forward kernel (shaun_log_obs_block / softmax_log_obs_block), saving
    one full [N, T, P] HBM round trip vs the two-kernel serving chain
    (obs write + forward read ~ 3.2 GB at N=128, T=8192, P=384).

    obs: dict(method='shaun', spw=..., threshold_logit=..., p=0.8,
    scale=2.0) or dict(method='softmax-scaled'/'softmax-unscaled',
    spw=..., threshold_logit=..., init_probs=[S]).

    Same T1 contract as viterbi_forward_pallas_banded_batch fed with the
    standalone obs kernels' output (identical obs math; tested equal)."""
    if interpret is None:
        interpret = _use_interpret()
    N, T_pad, P = logits_padded.shape
    assert P == bs.P and N % 8 == 0 and T_pad % block_frames == 0
    classes, singles = bs.classes, ()
    if classes and P < bs.n_bins + bs.d_max:
        classes, singles = (), tuple(range(-bs.d_max, bs.d_max + 1))
    if isinstance(lengths, jax.core.Tracer):
        ragged = True
    else:
        lengths_np = np.asarray(lengths)
        ragged = bool(np.any(lengths_np != T_pad))

    method = obs["method"]
    spw = int(obs["spw"])
    log_prior_row = np.zeros((1, P), np.float32)
    if method == "shaun":
        obs_mode = ("shaun", spw)
        p32 = np.float32(obs.get("p", 0.8))
        params = np.asarray(
            [np.float32(obs["threshold_logit"]),
             np.float32(np.log(p32 / (np.float32(1.0) - p32))),
             np.float32(obs.get("scale", 2.0)),
             0.0],
            np.float32,
        )
    elif method in ("softmax-scaled", "softmax-unscaled"):
        obs_mode = ("softmax", spw)
        prior_uv = 1.0
        if method == "softmax-scaled":
            pri = np.asarray(obs["init_probs"], np.float32)
            assert pri.shape == (bs.n_bins + 1,)
            log_prior_row[0, spw : spw + bs.n_bins] = np.log(pri[: bs.n_bins])
            prior_uv = float(pri[bs.n_bins])
        params = np.asarray(
            [np.float32(obs["threshold_logit"]), prior_uv, 0.0, 0.0],
            np.float32,
        )
    else:
        raise ValueError(f"unknown obs method {method}")

    key = (
        bs.d_max, bs.n_bins, bs.S, bs.P,
        bs.log_c_uv, bs.log_c_vu, bs.log_c_uu, classes, singles, ragged,
        obs_mode,
    )
    bv = bs.bv if (bs.bv is not None and len(classes)) else None
    if bv is None or bv.shape[0] == 0:
        bv = np.zeros((1, P), np.float32)
    run = _build_banded_call(key, N, T_pad, block_frames, bool(interpret))
    return run(
        jnp.asarray(lengths, jnp.int32),
        jnp.asarray(logits_padded),
        jnp.asarray(bs.band),
        jnp.asarray(bv),
        jnp.asarray(log_pi),
        jnp.asarray(params),
        jnp.asarray(log_prior_row),
    )


def _make_banded_backtrace_kernel(key: tuple, N: int):
    (d_max, n_bins, S, P, log_c_uv, log_c_vu, log_c_uu, classes) = key
    from .viterbi_pallas import GROUP

    # Reconstruction plan: seed bvsel with the class holding the most
    # offsets (for shaped melody matrices: the floored tail spanning the
    # whole band), then override the remaining offsets one select each.
    default_ci = max(range(len(classes)), key=lambda ci: len(classes[ci][0]))
    overrides = tuple(
        (ci, d)
        for ci, (offsets, _, _, _) in enumerate(classes)
        if ci != default_ci
        for d in offsets
    )

    def kernel(len_ref, init_ref, t1m1_ref, bv_ref, states_ref, s_carry):
        i = pl.program_id(0)
        c = pl.num_programs(0) - 1 - i
        _, L, _ = t1m1_ref.shape
        base_t = c * L
        lane_P = jax.lax.broadcasted_iota(jnp.int32, (N, P), 1)
        lane_L = jax.lax.broadcasted_iota(jnp.int32, (N, L), 1)
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        # loop-invariant pieces of the reconstructed logB row
        # sources at/beyond the unvoiced lane, voiced target:
        vtail = jnp.where(
            lane_row == n_bins, jnp.float32(log_c_uv), jnp.float32(NEG_PAD)
        )  # [1, P]
        # the full unvoiced-target row logB[n_bins, :]:
        uv_row = jnp.where(
            lane_row < n_bins,
            jnp.float32(log_c_vu),
            jnp.where(
                lane_row == n_bins, jnp.float32(log_c_uu), jnp.float32(NEG_PAD)
            ),
        )  # [1, P]
        x_tail = lane_P >= n_bins  # [N, P]
        # [N, 1] int32 columns avoid unsupported i1 minor-dim reshapes
        lengths = jnp.stack(
            [jnp.full((1,), len_ref[n], jnp.int32) for n in range(N)]
        )
        inits = jnp.stack(
            [jnp.full((1,), init_ref[n], jnp.int32) for n in range(N)]
        )

        @pl.when(i == 0)
        def _():
            for n in range(N):
                s_carry[n] = init_ref[n]

        n_groups = L // GROUP

        def group(gi, acc):
            s, states_rows = acc  # s [N, 1], states_rows [N, L]
            g = (n_groups - 1) - gi
            j0 = pl.multiple_of(g * GROUP, GROUP)
            block = t1m1_ref[:, pl.ds(j0, GROUP), :]  # [N, G, P]
            for k in reversed(range(GROUP)):
                j = j0 + k
                t = base_t + j
                s = jnp.where(t == lengths - 1, inits, s)
                active = t < lengths  # [N, 1]
                states_rows = jnp.where(
                    jnp.logical_and(active, lane_L == j), s, states_rows
                )
                # reconstruct logB[s, :] per track from the band profiles
                e = lane_P - s  # [N, P] lane offset from the target
                bvsel = jnp.broadcast_to(bv_ref[default_ci, :][None, :], (N, P))
                for ci, d in overrides:
                    bvsel = jnp.where(e == d, bv_ref[ci, :][None, :], bvsel)
                row = jnp.where(
                    jnp.abs(e) <= d_max, bvsel, jnp.float32(LOG_TINY)
                )
                row = jnp.where(x_tail, vtail, row)
                row = jnp.where(s == n_bins, uv_row, row)
                cand = block[:, k, :] + row
                m = jnp.max(cand, axis=1, keepdims=True)  # [N, 1]
                bp = jnp.min(
                    jnp.where(cand == m, lane_P, P), axis=1, keepdims=True
                )  # [N, 1] first-max (min lane over equal maxima)
                s = jnp.where(active, bp.astype(jnp.int32), s)
            return (s, states_rows)

        init_s = jnp.stack(
            [jnp.full((1,), s_carry[n], jnp.int32) for n in range(N)]
        )  # [N, 1]
        s_final, states_rows = jax.lax.fori_loop(
            0, n_groups, group, (init_s, jnp.zeros((N, L), jnp.int32)),
            unroll=False,
        )
        states_ref[0, :, :] = states_rows
        for n in range(N):
            s_carry[n] = s_final[n, 0]

    return kernel


@functools.lru_cache(maxsize=32)
def _build_banded_backtrace_call(
    key: tuple, N: int, T_pad: int, block_frames: int, interpret: bool
):
    n_chunks = T_pad // block_frames
    P = key[3]
    n_bv = max(len(key[7]), 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (N, block_frames, P),
                lambda i, *_: (0, n_chunks - 1 - i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n_bv, P), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, N, block_frames),
                lambda i, *_: (n_chunks - 1 - i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[pltpu.SMEM((N,), jnp.int32)],
    )
    call = pl.pallas_call(
        _make_banded_backtrace_kernel(key, N),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, N, block_frames), jnp.int32)
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=40 * N * T_pad * P,
            bytes_accessed=N * T_pad * P * 4,
            transcendentals=0,
        ),
    )

    @jax.jit
    def run(lengths, last_states, t1m1, bv):
        states = call(lengths, last_states, t1m1, bv)[0]
        return jnp.transpose(states, (1, 0, 2)).reshape(states.shape[1], -1)

    return run


def viterbi_backtrace_pallas_banded_batch(
    bs: BandedStructure,
    t1m1,
    last_states,
    lengths,
    *,
    block_frames: int = 128,
    interpret: bool | None = None,
):
    """Batched reverse chase against a banded structure: bit-identical
    states to viterbi_backtrace_pallas_batch(t1m1, logB, ...) — the per-
    track logB row is reconstructed in lane space (module docstring)
    instead of dynamically loaded, removing the N-per-frame row loads.
    Returns states [N, T_pad] int32 (entries at or beyond each track's
    length are garbage)."""
    if interpret is None:
        interpret = _use_interpret()
    N, T_pad, P = t1m1.shape
    assert P == bs.P and N % 8 == 0 and T_pad % block_frames == 0
    assert bs.classes, "banded structure carries no source-profile classes"
    key = (
        bs.d_max, bs.n_bins, bs.S, bs.P,
        bs.log_c_uv, bs.log_c_vu, bs.log_c_uu, bs.classes,
    )
    run = _build_banded_backtrace_call(
        key, N, T_pad, block_frames, bool(interpret)
    )
    return run(
        jnp.asarray(lengths, jnp.int32),
        jnp.asarray(last_states, jnp.int32),
        t1m1,
        jnp.asarray(bs.bv),
    )
