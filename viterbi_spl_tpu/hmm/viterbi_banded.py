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

Negative result (measured on v5e, kept for the record): a "banded
backtrace" that reconstructs FULL backpointer rows per frame from the
banded structure (exact, frame-parallel) is ~3x SLOWER than the dense
backtrace's per-track dynamic logB row loads at production N — computing
all P lanes of every bp row costs about as much as a forward step, while
the dense chase only ever needs one lane per track. The dense backtrace
(viterbi_pallas.viterbi_backtrace_pallas_batch) therefore remains the
production pair for this forward.

`extract_banded_structure` validates the structure on the host and returns
None when it does not hold (imm's analytic matrix, random test matrices),
in which case callers fall back to the dense kernel.
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
    # source-profile groups (see extract_band_groups): contiguous d-ranges
    # whose log A[x, x-d] values depend only on the SOURCE x, so their
    # candidates collapse into a shift-doubling window max over one
    # pre-added vector h[x] = T1[x] + bv[x] — bitwise-exact, because every
    # window element IS the dense sum and fp max is reduction-order-free.
    groups: tuple = ()  # of (d_lo, d_hi) inclusive
    bv: np.ndarray | None = None  # [len(groups), P] f32 source profiles
    singles: tuple = ()  # d offsets not covered by any group


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
    groups, bv, singles = extract_band_groups(band, d_max, n, P)
    return BandedStructure(
        d_max=d_max,
        n_bins=n,
        S=S,
        P=P,
        band=band,
        log_c_uv=float(np.log(A[n, 0] + TINY)),
        log_c_vu=float(np.log(A[0, n] + TINY)),
        log_c_uu=float(np.log(A[n, n] + TINY)),
        groups=groups,
        bv=bv,
        singles=singles,
    )


def extract_band_groups(
    band: np.ndarray, d_max: int, n: int, P: int, min_len: int = 3
) -> tuple[tuple, np.ndarray, tuple]:
    """Detect contiguous d-ranges whose band values depend only on the
    SOURCE index x = s + d (exact f32 equality).

    The shaping pipeline pools transition counts by distance and floors
    small counts (SURVEY.md §2.4), so every |d| beyond a few semitone bins
    carries the SAME pooled count C; after row normalization
    A[x, s] = C / Z_x for all those (x, s) — a function of the source row
    alone. For such a group [d_lo, d_hi] the max over its candidates
    becomes a window max over h[x] = fl(T1[x] + bv[x]):

        max_{d in [d_lo, d_hi]} fl(T1[s+d] + band[d][s])
          = max_{x in [s+d_lo, s+d_hi]} h[x]

    which shift-doubling computes in O(log w) lane rolls instead of w
    (roll + add + max) triples. Exactness: each window element is the
    identical f32 sum the dense kernel forms, and fp max commutes.

    Returns (groups, bv, singles): groups is a tuple of (d_lo, d_hi)
    inclusive ranges (length >= min_len), bv a [len(groups), P] f32 array
    of source-profile vectors (NEG_PAD where x is never a valid source for
    the group), singles the remaining d offsets.
    """
    # per-d source profile pf_d[x] = band[d + d_max][x - d] (NaN = invalid)
    profiles = np.full((2 * d_max + 1, P), np.nan, np.float32)
    for d in range(-d_max, d_max + 1):
        s = np.arange(max(0, -d), min(n, n - d))  # valid targets
        profiles[d + d_max, s + d] = band[d + d_max, s]

    groups: list[tuple[int, int]] = []
    bvs: list[np.ndarray] = []
    singles: list[int] = []
    d = -d_max
    while d <= d_max:
        bv = profiles[d + d_max].copy()
        d_hi = d
        for d2 in range(d + 1, d_max + 1):
            p2 = profiles[d2 + d_max]
            both = ~np.isnan(bv) & ~np.isnan(p2)
            if not np.array_equal(bv[both], p2[both]):
                break
            new = np.isnan(bv) & ~np.isnan(p2)
            bv[new] = p2[new]
            d_hi = d2
        if d_hi - d + 1 >= min_len:
            groups.append((d, d_hi))
            out = np.full(P, NEG_PAD, np.float32)
            ok = ~np.isnan(bv)
            out[ok] = bv[ok]
            bvs.append(out)
        else:
            singles.extend(range(d, d_hi + 1))
        d = d_hi + 1
    bv_arr = (
        np.stack(bvs) if bvs else np.zeros((0, P), np.float32)
    )
    return tuple(groups), bv_arr, tuple(singles)


def _make_banded_forward_kernel(bs_key: tuple, N: int):
    (d_max, n_bins, S, P, log_c_uv, log_c_vu, log_c_uu, groups, singles) = bs_key

    def kernel(
        len_ref, obs_ref, band_ref, bv_ref, logpi_ref,
        t1m1_ref, t1_last_ref, carry, carry_uv,
    ):
        chunk = pl.program_id(0)
        _, L, _ = obs_ref.shape
        base_t = chunk * L
        lane = jax.lax.broadcasted_iota(jnp.int32, (N, P), 1)
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        lengths = jnp.stack(
            [jnp.full((1,), len_ref[n], jnp.int32) for n in range(N)]
        )  # [N, 1]
        logpi_row = logpi_ref[0, :][None, :]
        # the unvoiced-state carry column avoids a per-frame lane extraction
        # (a where + lane reduce); these one-time extractions are exact
        logpi_uv = jnp.max(
            jnp.where(lane_row == n_bins, logpi_row, NEG_PAD),
            axis=1, keepdims=True,
        )  # [1, 1]

        def step_max(prev, prev_uv):
            """One banded max-plus step (pre-obs): incremental accumulation
            (a short list of live tensors — the round-1 tree formulation
            kept ~31 [N, P] candidates live and spilled to VMEM)."""
            voiced_prev = jnp.where(lane < n_bins, prev, NEG_PAD)
            max_voiced = jnp.max(voiced_prev, axis=1, keepdims=True)
            # out-of-band floor via the GLOBAL voiced max (exact; module
            # doc) and the unvoiced source, folded into one [N, 1] seed
            seed = jnp.maximum(max_voiced + LOG_TINY, prev_uv + log_c_uv)
            acc = jnp.broadcast_to(seed, (N, P))
            # source-profile groups: one add, then a shift-doubling window
            # max — each element IS the exact dense sum fl(T1[x] + bv[x])
            for gi, (d_lo, d_hi) in enumerate(groups):
                h = voiced_prev + bv_ref[gi, :][None, :]
                m = pltpu.roll(h, (-d_lo) % P, 1)  # m[s] = h[s + d_lo]
                cover, w = 1, d_hi - d_lo + 1
                while cover < w:
                    sft = min(cover, w - cover)
                    m = jnp.maximum(m, pltpu.roll(m, (P - sft) % P, 1))
                    cover += sft
                acc = jnp.maximum(acc, m)
            # ungrouped offsets: individual roll + add candidates
            for d in singles:
                shifted = pltpu.roll(prev, (-d) % P, 1)  # shifted[s] = prev[s+d]
                acc = jnp.maximum(acc, shifted + band_ref[d + d_max, :][None, :])
            # unvoiced target
            m_uv = jnp.maximum(max_voiced + log_c_vu, prev_uv + log_c_uu)
            m = jnp.where(lane == n_bins, m_uv, acc)
            return jnp.where(lane < S, m, NEG_PAD), m_uv

        # frame 0 is handled OUTSIDE the hot loop: the carry is
        # pre-initialized to T1[0] = log pi + obs[0], so the per-frame
        # update needs one fused (active AND t>0) select instead of the
        # is_first add+select pair
        @pl.when(chunk == 0)
        def _():
            obs0 = obs_ref[:, 0, :]
            carry[:, :] = logpi_row + obs0
            lane0 = jax.lax.broadcasted_iota(jnp.int32, (N, P), 1)
            obs0_uv = jnp.max(
                jnp.where(lane0 == n_bins, obs0, NEG_PAD), axis=1,
                keepdims=True,
            )
            carry_uv[:, :] = jnp.broadcast_to(
                logpi_uv + obs0_uv, carry_uv.shape
            )

        def group(g, carry_pair):
            prev, prev_uv = carry_pair
            j0 = pl.multiple_of(g * GROUP, GROUP)
            obs_blk = obs_ref[:, pl.ds(j0, GROUP), :]
            # amortized per-block extraction of the unvoiced obs lane
            lane3 = jax.lax.broadcasted_iota(jnp.int32, (N, GROUP, P), 2)
            obs_uv_blk = jnp.max(
                jnp.where(lane3 == n_bins, obs_blk, NEG_PAD), axis=2
            )  # [N, GROUP]
            rows = []
            for k in range(GROUP):
                t = base_t + j0 + k
                obs_j = obs_blk[:, k, :]
                obs_uv_j = obs_uv_blk[:, k : k + 1]  # [N, 1]
                # frame t > 0 advances tracks still active; frame 0 keeps
                # the pre-initialized carry (row 0 is zeroed post-loop)
                step = jnp.logical_and(t > 0, t < lengths)  # [N, 1]
                rows.append(prev)
                m, m_uv = step_max(prev, prev_uv)
                prev = jnp.where(step, m + obs_j, prev)
                # bitwise-consistent with prev[:, n_bins]: same f32 adds on
                # the same exactly-extracted operands
                prev_uv = jnp.where(step, m_uv + obs_uv_j, prev_uv)
            t1m1_ref[:, pl.ds(j0, GROUP), :] = jnp.stack(rows, axis=1)
            return (prev, prev_uv)

        init = (
            carry[:, :],
            jnp.max(carry_uv[:, :], axis=1, keepdims=True),  # lanes all equal
        )
        prev, prev_uv = jax.lax.fori_loop(
            0, L // GROUP, group, init, unroll=True
        )
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
    """Jitted pallas call cached per (structure scalars+groups, shapes)."""
    d_max, n_bins, S, P, log_c_uv, log_c_vu, log_c_uu, groups, singles = key
    n_chunks = T_pad // block_frames
    W = 2 * d_max + 1
    n_bv = max(len(groups), 1)  # zero-sized VMEM blocks are not tileable
    # rough VPU-op cost: 3 ops per single, ~(log2 w + 3) per group, ~12 misc
    ops = 3 * len(singles) + sum(
        int(np.ceil(np.log2(hi - lo + 1))) + 3 for lo, hi in groups
    ) + 12

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((N, block_frames, P), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bv, P), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, block_frames, P), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
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
            transcendentals=0,
        ),
    )

    @jax.jit
    def run(lengths, obs_batch, band, bv, log_pi):
        t1m1, t1_last = call(
            lengths.astype(jnp.int32),
            obs_batch.astype(jnp.float32),
            band,
            bv,
            log_pi.astype(jnp.float32)[None, :],
        )
        return t1_last, t1m1

    return run


LANE_UV = 128  # lane width of the broadcast unvoiced-carry scratch


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
    viterbi_forward_pallas_batch, bit-identical T1 values."""
    if interpret is None:
        interpret = _use_interpret()
    N, T_pad, P = obs_batch.shape
    assert P == bs.P and N % 8 == 0 and T_pad % block_frames == 0
    groups, singles = bs.groups, bs.singles
    # the grouped window max masks wrapped lanes by SOURCE (bv), which is
    # only safe when rolls cannot wrap valid sources onto valid targets
    if groups and P < bs.n_bins + bs.d_max:
        groups, singles = (), tuple(range(-bs.d_max, bs.d_max + 1))
    key = (
        bs.d_max, bs.n_bins, bs.S, bs.P,
        bs.log_c_uv, bs.log_c_vu, bs.log_c_uu, groups, singles,
    )
    bv = bs.bv if (bs.bv is not None and len(groups)) else None
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
