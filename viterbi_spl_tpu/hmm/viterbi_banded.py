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
    return BandedStructure(
        d_max=d_max,
        n_bins=n,
        S=S,
        P=P,
        band=band,
        log_c_uv=float(np.log(A[n, 0] + TINY)),
        log_c_vu=float(np.log(A[0, n] + TINY)),
        log_c_uu=float(np.log(A[n, n] + TINY)),
    )


def _make_banded_forward_kernel(bs: BandedStructure, N: int):
    d_max, n_bins, S, P = bs.d_max, bs.n_bins, bs.S, bs.P
    # plain Python floats: closures may not capture traced constants, and
    # these values are exactly f32-representable (computed from f32 inputs)
    log_c_uv = bs.log_c_uv
    log_c_vu = bs.log_c_vu
    log_c_uu = bs.log_c_uu

    def kernel(len_ref, obs_ref, band_ref, logpi_ref, t1m1_ref, t1_last_ref, carry):
        chunk = pl.program_id(0)
        _, L, _ = obs_ref.shape
        base_t = chunk * L
        lane = jax.lax.broadcasted_iota(jnp.int32, (N, P), 1)
        lengths = jnp.stack(
            [jnp.full((1,), len_ref[n], jnp.int32) for n in range(N)]
        )  # [N, 1]

        def step_max(prev):
            """One banded max-plus step: [N, P] -> [N, P] (pre-obs)."""
            voiced_prev = jnp.where(lane < n_bins, prev, NEG_PAD)
            # in-band candidates
            cands = []
            for d in range(-d_max, d_max + 1):
                shifted = pltpu.roll(prev, (-d) % P, 1)  # shifted[s] = prev[s+d]
                cands.append(shifted + band_ref[d + d_max, :][None, :])
            # unvoiced source -> voiced targets
            uv_val = jnp.max(
                jnp.where(lane == n_bins, prev, NEG_PAD), axis=1, keepdims=True
            )
            cands.append(jnp.broadcast_to(uv_val + log_c_uv, (N, P)))
            # out-of-band floor via the GLOBAL voiced max (exact; see module
            # docstring) — also reused for the unvoiced target below
            max_voiced = jnp.max(voiced_prev, axis=1, keepdims=True)
            cands.append(jnp.broadcast_to(max_voiced + LOG_TINY, (N, P)))
            # balanced tree max keeps the sequential dependency chain short
            while len(cands) > 1:
                nxt = [
                    jnp.maximum(cands[i], cands[i + 1])
                    for i in range(0, len(cands) - 1, 2)
                ]
                if len(cands) % 2:
                    nxt.append(cands[-1])
                cands = nxt
            cand = cands[0]
            # unvoiced target
            m_uv = jnp.maximum(max_voiced + log_c_vu, uv_val + log_c_uu)
            m = jnp.where(lane == n_bins, m_uv, cand)
            return jnp.where(lane < S, m, NEG_PAD)

        def group(g, prev):
            j0 = pl.multiple_of(g * GROUP, GROUP)
            obs_blk = obs_ref[:, pl.ds(j0, GROUP), :]
            rows = []
            for k in range(GROUP):
                t = base_t + j0 + k
                obs_j = obs_blk[:, k, :]
                is_first = t == 0
                active = t < lengths
                # row k stores T1[t-1] (zeros for t == 0, where it is unused)
                rows.append(jnp.where(is_first, 0.0, prev))
                m = step_max(prev)
                prev = jnp.where(
                    is_first,
                    logpi_ref[0, :][None, :] + obs_j,
                    jnp.where(active, m + obs_j, prev),
                )
            t1m1_ref[:, pl.ds(j0, GROUP), :] = jnp.stack(rows, axis=1)
            return prev

        prev = jax.lax.fori_loop(0, L // GROUP, group, carry[:, :], unroll=False)
        carry[:, :] = prev

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
    """Jitted pallas call cached per (structure scalars, shapes)."""
    d_max, n_bins, S, P, log_c_uv, log_c_vu, log_c_uu = key
    bs_like = BandedStructure(
        d_max=d_max, n_bins=n_bins, S=S, P=P,
        band=np.zeros((2 * d_max + 1, P), np.float32),  # placeholder; traced
        log_c_uv=log_c_uv, log_c_vu=log_c_vu, log_c_uu=log_c_uu,
    )
    n_chunks = T_pad // block_frames
    W = 2 * d_max + 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((N, block_frames, P), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, block_frames, P), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((N, P), jnp.float32)],
    )
    call = pl.pallas_call(
        _make_banded_forward_kernel(bs_like, N),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, T_pad, P), jnp.float32),
            jax.ShapeDtypeStruct((N, P), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=3 * N * T_pad * P * W, bytes_accessed=N * T_pad * P * 8,
            transcendentals=0,
        ),
    )

    @jax.jit
    def run(lengths, obs_batch, band, log_pi):
        t1m1, t1_last = call(
            lengths.astype(jnp.int32),
            obs_batch.astype(jnp.float32),
            band,
            log_pi.astype(jnp.float32)[None, :],
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
    viterbi_forward_pallas_batch, bit-identical T1 values."""
    if interpret is None:
        interpret = _use_interpret()
    N, T_pad, P = obs_batch.shape
    assert P == bs.P and N % 8 == 0 and T_pad % block_frames == 0
    key = (bs.d_max, bs.n_bins, bs.S, bs.P, bs.log_c_uv, bs.log_c_vu, bs.log_c_uu)
    run = _build_banded_call(key, N, T_pad, block_frames, bool(interpret))
    return run(
        jnp.asarray(lengths, jnp.int32),
        jnp.asarray(obs_batch),
        jnp.asarray(bs.band),
        jnp.asarray(log_pi),
    )
