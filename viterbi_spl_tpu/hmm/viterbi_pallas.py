"""Pallas TPU kernels for dense max-plus Viterbi decoding.

The DP step `T1[t][s] = max_s' (T1[t-1][s'] + B[s, s']) + log b_t[s]` is a
max-plus "matmul" row: a broadcast add of the carry row over the resident
transition matrix followed by a lane-axis max/first-argmax. The reference's
hot loop (dcnet/softmax_viterbi.py:2475-2479, and its Numba-AOT native
module dcnet/aot_viterbi_core.py) becomes two kernels:

  forward  — grid over time chunks; log B stays resident in VMEM; the T1
             carry row lives in a VMEM scratch that persists across grid
             steps; observation rows stream HBM->VMEM; int16 backpointers
             stream VMEM->HBM. Frames are processed in statically-unrolled
             groups of 16 so backpointer stores hit sublane-aligned tiles.
  backtrace — grid over time chunks in REVERSE; the pointer chase
             s_{t-1} = T2[t][s_t] is evaluated as a one-hot dot on the VPU
             (no scalar gathers); the chunk-boundary state is carried in
             SMEM scratch.

State counts are padded to lane multiples (321/361 -> 384, 722 -> 768) with
NEG_PAD rows/cols so padded states can never win an argmax. Tie-breaking is
first-max (computed as min-index-over-equal-max), bit-identical to np.argmax
and to `oracle.viterbi_oracle` — the same cross-implementation equality the
reference asserts between its native and Python decoders
(dcnet/tf_viterbi_decoding.py:284).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .viterbi import NEG_PAD, TINY, prepare_log_params

LANE = 128
# Frames per statically-unrolled inner group: int16 VMEM tiles are
# (16, 128), so groups of 16 keep every dynamic sublane offset aligned.
GROUP = 16


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _forward_kernel(T_ref, obs_ref, logB_ref, logpi_ref, t2_ref, t1_last_ref, carry):
    """One time-chunk of the forward DP.

    T_ref: scalar-prefetch [1] int32 — true (unpadded) number of frames.
    obs_ref: [L, P] f32 log-observations for this chunk (VMEM).
    logB_ref: [P, P] f32 log(A.T) (VMEM, resident).
    logpi_ref: [1, P] f32 log initial probs.
    t2_ref: [L, P] backpointers out.
    t1_last_ref: [1, P] f32 final T1 row out.
    carry: VMEM scratch [1, P] f32 — T1 row, persists across grid steps.

    Frame updates are fully predicated (jnp.where) so the loop body is
    branch-free: frames past T leave the carry unchanged, frame 0 loads the
    initial distribution.
    """
    chunk = pl.program_id(0)
    L, P = obs_ref.shape
    base_t = chunk * L
    T = T_ref[0]
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (GROUP, P), 0)

    def group(g, _):
        j0 = pl.multiple_of(g * GROUP, GROUP)
        obs_blk = obs_ref[pl.ds(j0, GROUP), :]  # [G, P]
        buf = jnp.zeros((GROUP, P), jnp.int32)
        for k in range(GROUP):
            t = base_t + j0 + k
            obs_j = obs_blk[k, :]
            prev = carry[0, :]
            scores = prev[None, :] + logB_ref[:, :]  # [s, s']
            m = jnp.max(scores, axis=1)
            eq = scores == m[:, None]
            bp = jnp.min(jnp.where(eq, col_idx, P), axis=1)
            is_first = t == 0
            active = t < T
            new_carry = jnp.where(
                is_first,
                logpi_ref[0, :] + obs_j,
                jnp.where(active, m + obs_j, prev),
            )
            carry[0, :] = new_carry
            bp_row = jnp.where(is_first, 0, bp)
            buf = jnp.where(row_iota == k, bp_row[None, :], buf)
        t2_ref[pl.ds(j0, GROUP), :] = buf.astype(t2_ref.dtype)
        return 0

    jax.lax.fori_loop(0, L // GROUP, group, 0, unroll=False)

    @pl.when(chunk == pl.num_programs(0) - 1)
    def _():
        t1_last_ref[0, :] = carry[0, :]


def _backtrace_kernel(T_ref, init_state_ref, t2_ref, states_ref, s_carry):
    """One time-chunk (reverse order) of the pointer chase.

    t2_ref: [L, P] backpointers for ORIGINAL chunk c = n_chunks-1-i; groups
    of 16 rows are loaded at aligned sublane offsets and the chase
    s_{t-1} = T2[t][s_t] is a one-hot masked sum on the VPU.
    states_ref: [1, 8, L] int32 decoded states for this chunk (the row is
    replicated over the 8 sublanes to satisfy TPU store tiling; the caller
    reads sublane 0).
    s_carry: SMEM scratch [1] int32 — state at the last valid frame of the
             chunk currently being processed; persists across grid steps.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    c = n - 1 - i
    L, P = t2_ref.shape
    base_t = c * L
    T = T_ref[0]

    @pl.when(i == 0)
    def _():
        s_carry[0] = init_state_ref[0]

    lane_P = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    lane_L = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    n_groups = L // GROUP

    def group(gi, acc):
        s, states_row = acc
        g = (n_groups - 1) - gi
        j0 = pl.multiple_of(g * GROUP, GROUP)
        block = t2_ref[pl.ds(j0, GROUP), :].astype(jnp.int32)  # [G, P]
        for k in reversed(range(GROUP)):
            j = j0 + k
            t = base_t + j
            active = t < T
            states_row = jnp.where(
                jnp.logical_and(active, lane_L == j), s, states_row
            )
            row_k = block[k, :][None, :]
            chased = jnp.sum(jnp.where(lane_P == s, row_k, 0))
            s = jnp.where(active, chased, s)
        return (s, states_row)

    init = (s_carry[0], jnp.zeros((1, L), jnp.int32))
    s_final, states_row = jax.lax.fori_loop(0, n_groups, group, init, unroll=False)
    states_ref[0, :, :] = jnp.broadcast_to(states_row, (8, L))
    s_carry[0] = s_final


@functools.partial(
    jax.jit,
    static_argnames=("block_frames", "t2_dtype", "interpret", "take_log"),
)
def viterbi_forward_pallas(
    log_B,
    log_pi,
    obs_padded,
    T,
    *,
    block_frames: int = 512,
    t2_dtype=jnp.int16,
    interpret: bool | None = None,
    take_log: bool = False,
):
    """Forward DP on TPU.

    log_B: [P, P] f32 (P a lane multiple, padded with NEG_PAD).
    log_pi: [P] f32.
    obs_padded: [T_pad, P] f32 — log-observations (or raw probabilities when
        take_log=True), T_pad a multiple of block_frames.
    T: true frame count (traced scalar ok).

    Returns (t1_last [P] f32, t2 [T_pad, P] t2_dtype).
    """
    if interpret is None:
        interpret = _use_interpret()
    P = log_B.shape[0]
    T_pad = obs_padded.shape[0]
    assert block_frames % GROUP == 0, "block_frames must be a multiple of 16"
    assert T_pad % block_frames == 0 and P % LANE == 0
    n_chunks = T_pad // block_frames

    if take_log:
        obs_padded = jnp.log(obs_padded.astype(jnp.float32) + TINY)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (block_frames, P), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((P, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_frames, P), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((1, P), jnp.float32)],
    )

    t2, t1_last = pl.pallas_call(
        _forward_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, P), t2_dtype),
            jax.ShapeDtypeStruct((1, P), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * T_pad * P * P, bytes_accessed=T_pad * P * 6, transcendentals=0
        ),
    )(
        jnp.asarray([T], jnp.int32),
        obs_padded.astype(jnp.float32),
        log_B.astype(jnp.float32),
        log_pi.astype(jnp.float32)[None, :],
    )
    return t1_last[0], t2


@functools.partial(jax.jit, static_argnames=("block_frames", "interpret"))
def viterbi_backtrace_pallas(
    t2, last_state, T, *, block_frames: int = 512, interpret: bool | None = None
):
    """Pointer chase over the backpointer table, reverse chunk order.

    t2: [T_pad, P]; last_state: scalar int32; returns states [T_pad] int32
    (entries >= T are garbage; slice [:T] on the host).
    """
    if interpret is None:
        interpret = _use_interpret()
    T_pad, P = t2.shape
    assert T_pad % block_frames == 0 and block_frames % GROUP == 0
    n_chunks = T_pad // block_frames

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (block_frames, P),
                lambda i, *_: (n_chunks - 1 - i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 8, block_frames),
                lambda i, *_: (n_chunks - 1 - i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )

    states = pl.pallas_call(
        _backtrace_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_chunks, 8, block_frames), jnp.int32)],
        interpret=interpret,
    )(
        jnp.asarray([T], jnp.int32),
        jnp.asarray([last_state], jnp.int32),
        t2,
    )[0]
    return states[:, 0, :].reshape(-1)


def pad_state_dim(arr_2d: np.ndarray, P: int, fill: float) -> np.ndarray:
    out = np.full((arr_2d.shape[0], P), fill, np.float32)
    out[:, : arr_2d.shape[1]] = arr_2d
    return out


def viterbi_decode_pallas(
    *,
    transition_matrix,
    prob_init,
    probs_st,
    block_frames: int = 512,
    interpret: bool | None = None,
) -> np.ndarray:
    """Single-track decode matching the oracle signature (probs_st is [S, T]).

    Host-side prep pads S to a lane multiple and T to a block multiple, then
    runs the forward + backtrace kernels. Returns [T] int64 states.
    """
    S = np.asarray(transition_matrix).shape[0]
    P = _round_up(S, LANE)
    log_B, log_pi = prepare_log_params(transition_matrix, prob_init, pad_to=P)

    probs = np.asarray(probs_st, np.float32)
    T = probs.shape[1]
    T_pad = _round_up(T, block_frames)
    obs = np.zeros((T_pad, P), np.float32)
    obs[:T, :S] = probs.T
    log_obs = np.log(obs + TINY)  # NumPy log: bit-identical to the oracle
    log_obs[:, S:] = NEG_PAD

    t1_last, t2 = viterbi_forward_pallas(
        jnp.asarray(log_B),
        jnp.asarray(log_pi),
        jnp.asarray(log_obs),
        T,
        block_frames=block_frames,
        interpret=interpret,
    )
    t1_host = np.asarray(t1_last)[:S]
    last_state = int(np.argmax(t1_host))
    states = viterbi_backtrace_pallas(
        t2, last_state, T, block_frames=block_frames, interpret=interpret
    )
    return np.asarray(states[:T], np.int64)
