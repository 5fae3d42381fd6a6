"""Pallas TPU kernels for dense max-plus Viterbi decoding.

The DP step `T1[t][s] = max_s' (T1[t-1][s'] + B[s, s']) + log b_t[s]` is a
max-plus "matmul" row: a broadcast add of the carry row over the resident
transition matrix followed by a lane-axis max. The reference's hot loop
(dcnet/softmax_viterbi.py:2475-2479, and its Numba-AOT native module
dcnet/aot_viterbi_core.py) becomes two kernels:

  forward  — grid over time chunks; log B resident in VMEM; the T1 carry row
             is a register value within a chunk and persists across chunks in
             VMEM scratch. Stores NO backpointers: it streams the (shifted)
             T1 rows to HBM instead, which removes the argmax passes (the
             most expensive part of the classic formulation) from the
             sequential hot loop entirely.
  backtrace — grid over time chunks in REVERSE. The backpointer for frame t
             is reconstructed on the fly from the stored row:
             s_{t-1} = first-argmax_{s'} (T1[t-1][s'] + B[s_t, s']), where
             the B row is gathered with an exact dynamic-row load. This is
             bit-identical to materializing backpointers in the forward
             pass, because the candidate row is exactly the score row the
             forward pass reduced.

Batched variants (suffix `_batch`) decode N tracks together sharing the
resident transition matrix — the N independent recursions fill the VPU far
better than one (~3.7x aggregate throughput at N=16 on v5e).

State counts are padded to lane multiples (321/361 -> 384, 722 -> 768) with
NEG_PAD rows/cols so padded states can never win a max. Tie-breaking is
first-max (min-index-over-equal-max), bit-identical to np.argmax and to
`oracle.viterbi_oracle` — the same cross-implementation equality the
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
# Frames per statically-unrolled inner group: float32 VMEM tiles are
# (8, 128); groups of 16 keep dynamic sublane offsets aligned for both f32
# and any 16-bit auxiliary stores.
GROUP = 16
_VMEM_LIMIT = 100 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _forward_kernel(T_ref, obs_ref, logA_ref, logpi_ref, t1m1_ref, t1_last_ref, carry):
    """One time-chunk of the forward DP (max only, no argmax).

    Sublane-reduction layout: the carry row is transposed to a column each
    frame and added to the UNtransposed log A (scores[s', s]); the max then
    reduces over the sublane axis, which lowers to vreg-accumulate maxes
    instead of the costlier lane shuffle trees.

    T_ref: scalar-prefetch [1] int32 — true (unpadded) number of frames.
    obs_ref: [L, P] f32 log-observations for this chunk (VMEM).
    logA_ref: [P, P] f32 log(A) (VMEM, resident), logA[s', s].
    logpi_ref: [1, P] f32 log initial probs.
    t1m1_ref: [L, P] f32 out — SHIFTED T1: row j holds T1[t-1] for t = base+j
              (exactly what the backtrace needs; row for t=0 is zeros).
    t1_last_ref: [1, P] f32 out — final T1 row.
    carry: VMEM scratch [1, P] f32 — persists across grid steps.
    """
    chunk = pl.program_id(0)
    L, P = obs_ref.shape
    base_t = chunk * L
    T = T_ref[0]
    # reset row: the frame whose carry is re-initialized to log_pi + obs.
    # 0 for ordinary decodes; the sequence-parallel halo decode uses H for
    # the first block (exact start mid-window) and -1 for cold-started
    # blocks (t == 0 then initializes to obs alone, a uniform max-plus
    # prior — dist/sharded_viterbi semantics).
    reset_row = T_ref[1]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (GROUP, P), 0)

    def group(g, prev):  # prev: [1, P]
        j0 = pl.multiple_of(g * GROUP, GROUP)
        obs_blk = obs_ref[pl.ds(j0, GROUP), :]  # [G, P]
        buf = jnp.zeros((GROUP, P), jnp.float32)
        for k in range(GROUP):
            t = base_t + j0 + k
            obs_j = obs_blk[k, :][None, :]
            is_first = t == 0
            active = t < T
            # row j stores T1[t-1] (zeros for t == 0, where it is unused)
            buf = jnp.where(row_iota == k, jnp.where(is_first, 0.0, prev), buf)
            scores = jnp.transpose(prev) + logA_ref[:, :]  # [s', s]
            m = jnp.max(scores, axis=0, keepdims=True)  # [1, P]
            prev = jnp.where(
                t == reset_row,
                logpi_ref[0, :][None, :] + obs_j,
                jnp.where(
                    is_first, obs_j, jnp.where(active, m + obs_j, prev)
                ),
            )
        t1m1_ref[pl.ds(j0, GROUP), :] = buf
        return prev

    prev = jax.lax.fori_loop(0, L // GROUP, group, carry[:, :], unroll=False)
    carry[:, :] = prev

    @pl.when(chunk == pl.num_programs(0) - 1)
    def _():
        t1_last_ref[:, :] = prev


def _backtrace_kernel(T_ref, init_state_ref, t1m1_ref, logB_ref, states_ref, s_carry):
    """One time-chunk (reverse order) of the backpointer-free pointer chase.

    For each frame t (descending): emit s_t, then reconstruct
    s_{t-1} = first-argmax_{s'} (T1[t-1][s'] + B[s_t, s']) from the stored
    shifted row t1m1[t] and the one-hot-gathered B row.

    t1m1_ref: [L, P] f32 rows for ORIGINAL chunk c = n_chunks-1-i.
    logB_ref: [P, P] f32 resident.
    states_ref: [1, 8, L] int32 out (row replicated over 8 sublanes for
                store tiling; caller reads sublane 0).
    s_carry: SMEM scratch [1] int32 — persists across grid steps.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    c = n - 1 - i
    L, P = t1m1_ref.shape
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
        block = t1m1_ref[pl.ds(j0, GROUP), :]  # [G, P]
        for k in reversed(range(GROUP)):
            j = j0 + k
            t = base_t + j
            active = t < T
            states_row = jnp.where(
                jnp.logical_and(active, lane_L == j), s, states_row
            )
            # gather B[s, :] (transitions INTO state s) with an exact
            # dynamic-row load (MXU one-hot products round through bf16 and
            # break bit-exactness vs the forward pass)
            b_row = logB_ref[pl.ds(s, 1), :]  # [1, P]
            cand = block[k, :][None, :] + b_row
            m = jnp.max(cand)
            bp = jnp.min(jnp.where(cand == m, lane_P, P))
            s = jnp.where(active, bp, s)
        return (s, states_row)

    init = (s_carry[0], jnp.zeros((1, L), jnp.int32))
    s_final, states_row = jax.lax.fori_loop(0, n_groups, group, init, unroll=False)
    states_ref[0, :, :] = jnp.broadcast_to(states_row, (8, L))
    s_carry[0] = s_final


@functools.partial(
    jax.jit,
    static_argnames=("block_frames", "interpret", "take_log"),
)
def viterbi_forward_pallas(
    log_B,
    log_pi,
    obs_padded,
    T,
    reset_row=0,
    *,
    block_frames: int = 512,
    interpret: bool | None = None,
    take_log: bool = False,
):
    """Forward DP on TPU.

    log_B: [P, P] f32 (P a lane multiple, padded with NEG_PAD).
    log_pi: [P] f32.
    obs_padded: [T_pad, P] f32 — log-observations (or raw probabilities when
        take_log=True), T_pad a multiple of block_frames.
    T: true frame count (traced scalar ok).
    reset_row: frame whose carry is initialized to log_pi + obs (0 for
        ordinary decodes; -1 = cold uniform start at frame 0, used by the
        sequence-parallel halo decode).

    Returns (t1_last [P] f32, t1m1 [T_pad, P] f32) where t1m1[t] = T1[t-1]
    (t1m1[0] is zeros and unused).
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

    t1m1, t1_last = pl.pallas_call(
        _forward_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, P), jnp.float32),
            jax.ShapeDtypeStruct((1, P), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * T_pad * P * P, bytes_accessed=T_pad * P * 8, transcendentals=0
        ),
    )(
        jnp.asarray(jnp.stack([jnp.asarray(T), jnp.asarray(reset_row)]), jnp.int32),
        obs_padded.astype(jnp.float32),
        jnp.transpose(log_B.astype(jnp.float32)),  # kernel wants log A
        log_pi.astype(jnp.float32)[None, :],
    )
    return t1_last[0], t1m1


@functools.partial(jax.jit, static_argnames=("block_frames", "interpret"))
def viterbi_backtrace_pallas(
    t1m1,
    log_B,
    last_state,
    T,
    *,
    block_frames: int = 512,
    interpret: bool | None = None,
):
    """Reverse pointer chase with on-the-fly backpointer reconstruction.

    t1m1: [T_pad, P] f32 shifted T1 rows from the forward pass.
    log_B: [P, P] f32 (same operand as the forward pass).
    last_state: scalar int32 (argmax of the final T1 row).
    Returns states [T_pad] int32 (entries >= T are garbage; slice [:T]).
    """
    if interpret is None:
        interpret = _use_interpret()
    T_pad, P = t1m1.shape
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
            pl.BlockSpec((P, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(
        jnp.asarray([T], jnp.int32),
        jnp.asarray([last_state], jnp.int32),
        t1m1,
        log_B.astype(jnp.float32),
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

    log_B_d = jnp.asarray(log_B)
    t1_last, t1m1 = viterbi_forward_pallas(
        log_B_d,
        jnp.asarray(log_pi),
        jnp.asarray(log_obs),
        T,
        block_frames=block_frames,
        interpret=interpret,
    )
    t1_host = np.asarray(t1_last)[:S]
    last_state = int(np.argmax(t1_host))
    states = viterbi_backtrace_pallas(
        t1m1, log_B_d, last_state, T, block_frames=block_frames, interpret=interpret
    )
    return np.asarray(states[:T], np.int64)


# ----------------------------------------------------------------------
# Batched (multi-track) kernels — the serving shape of BASELINE config 4:
# N tracks decode together, sharing the VMEM-resident transition matrix;
# the N independent recursions fill the VPU far better than one
# (measured ~3.7x aggregate throughput at N=16 on v5e).
# ----------------------------------------------------------------------


def _forward_kernel_batch(
    len_ref, obs_ref, logA_ref, logpi_ref, t1m1_ref, t1_last_ref, carry
):
    """Batched forward: obs_ref [N, L, P]; len_ref [N] per-track frame
    counts; carry [N, P]. Per-track masking freezes each track's carry at
    its own final frame, so t1_last is exact per track."""
    chunk = pl.program_id(0)
    N, L, P = obs_ref.shape
    base_t = chunk * L
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (N, GROUP, P), 1)
    # [N, 1] int32 so per-track masks come out 2-D without i1 reshapes
    lengths = jnp.stack([jnp.full((1,), len_ref[n], jnp.int32) for n in range(N)])

    def group(g, prev):  # prev [N, P]
        j0 = pl.multiple_of(g * GROUP, GROUP)
        obs_blk = obs_ref[:, pl.ds(j0, GROUP), :]
        buf = jnp.zeros((N, GROUP, P), jnp.float32)
        for k in range(GROUP):
            t = base_t + j0 + k
            obs_j = obs_blk[:, k, :]
            is_first = t == 0
            active = t < lengths  # [N, 1]
            buf = jnp.where(
                row_iota == k, jnp.where(is_first, 0.0, prev)[:, None, :], buf
            )
            scores = prev[:, :, None] + logA_ref[:, :][None, :, :]  # [N, s', s]
            m = jnp.max(scores, axis=1)
            prev = jnp.where(
                is_first,
                logpi_ref[0, :][None, :] + obs_j,
                jnp.where(active, m + obs_j, prev),
            )
        t1m1_ref[:, pl.ds(j0, GROUP), :] = buf
        return prev

    prev = jax.lax.fori_loop(0, L // GROUP, group, carry[:, :], unroll=False)
    carry[:, :] = prev

    @pl.when(chunk == pl.num_programs(0) - 1)
    def _():
        t1_last_ref[:, :] = prev


def _backtrace_kernel_batch(
    len_ref, init_ref, t1m1_ref, logB_ref, states_ref, s_carry
):
    """Batched reverse chase: t1m1_ref [N, L, P]; states_ref [1, N, L]
    (N a sublane multiple); s_carry SMEM [N]. Each track resets its state
    to its own argmax when the sweep reaches its final frame."""
    i = pl.program_id(0)
    n_chunks_ = pl.num_programs(0)
    c = n_chunks_ - 1 - i
    N, L, P = t1m1_ref.shape
    base_t = c * L
    lane_P = jax.lax.broadcasted_iota(jnp.int32, (N, P), 1)
    lane_L = jax.lax.broadcasted_iota(jnp.int32, (N, L), 1)
    # [N, 1] int32 columns avoid unsupported i1 minor-dim reshapes
    lengths = jnp.stack([jnp.full((1,), len_ref[n], jnp.int32) for n in range(N)])
    inits = jnp.stack([jnp.full((1,), init_ref[n], jnp.int32) for n in range(N)])

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
            b_rows = jnp.concatenate(
                [logB_ref[pl.ds(s[n, 0], 1), :] for n in range(N)], axis=0
            )  # [N, P]
            cand = block[:, k, :] + b_rows
            m = jnp.max(cand, axis=1, keepdims=True)  # [N, 1]
            bp = jnp.min(
                jnp.where(cand == m, lane_P, P), axis=1, keepdims=True
            )  # [N, 1]
            s = jnp.where(active, bp.astype(jnp.int32), s)
        return (s, states_rows)

    init_s = jnp.stack(
        [jnp.full((1,), s_carry[n], jnp.int32) for n in range(N)]
    )  # [N, 1]
    s_final, states_rows = jax.lax.fori_loop(
        0, n_groups, group, (init_s, jnp.zeros((N, L), jnp.int32)), unroll=False
    )
    states_ref[0, :, :] = states_rows
    for n in range(N):
        s_carry[n] = s_final[n, 0]


@functools.partial(jax.jit, static_argnames=("block_frames", "interpret"))
def viterbi_forward_pallas_batch(
    log_B, log_pi, obs_batch, lengths, *, block_frames: int = 128,
    interpret: bool | None = None,
):
    """Batched forward DP: obs_batch [N, T_pad, P] log-observations,
    lengths [N] int32. N must be a multiple of 8 (sublane tile).
    Returns (t1_last [N, P], t1m1 [N, T_pad, P])."""
    if interpret is None:
        interpret = _use_interpret()
    N, T_pad, P = obs_batch.shape
    assert N % 8 == 0 and T_pad % block_frames == 0
    assert block_frames % GROUP == 0 and P % LANE == 0
    n_chunks = T_pad // block_frames

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((N, block_frames, P), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, block_frames, P), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((N, P), jnp.float32)],
    )
    t1m1, t1_last = pl.pallas_call(
        _forward_kernel_batch,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, T_pad, P), jnp.float32),
            jax.ShapeDtypeStruct((N, P), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * T_pad * P * P, bytes_accessed=N * T_pad * P * 8,
            transcendentals=0,
        ),
    )(
        jnp.asarray(lengths, jnp.int32),
        obs_batch.astype(jnp.float32),
        jnp.transpose(log_B.astype(jnp.float32)),
        log_pi.astype(jnp.float32)[None, :],
    )
    return t1_last, t1m1


@functools.partial(jax.jit, static_argnames=("block_frames", "interpret"))
def viterbi_backtrace_pallas_batch(
    t1m1, log_B, last_states, lengths, *, block_frames: int = 128,
    interpret: bool | None = None,
):
    """Batched reverse chase: returns states [N, T_pad] int32 (entries at or
    beyond each track's length are garbage)."""
    if interpret is None:
        interpret = _use_interpret()
    N, T_pad, P = t1m1.shape
    assert N % 8 == 0 and T_pad % block_frames == 0
    n_chunks = T_pad // block_frames

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((N, block_frames, P),
                         lambda i, *_: (0, n_chunks - 1 - i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, P), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, N, block_frames),
                         lambda i, *_: (n_chunks - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.SMEM((N,), jnp.int32)],
    )
    states = pl.pallas_call(
        _backtrace_kernel_batch,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_chunks, N, block_frames), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(
        jnp.asarray(lengths, jnp.int32),
        jnp.asarray(last_states, jnp.int32),
        t1m1,
        log_B.astype(jnp.float32),
    )[0]
    return jnp.transpose(states, (1, 0, 2)).reshape(states.shape[1], -1)


def viterbi_decode_batch_pallas(
    *,
    transition_matrix,
    prob_init,
    probs_st_list,
    block_frames: int = 128,
    interpret: bool | None = None,
    allow_banded: bool = True,
    mesh=None,
) -> list[np.ndarray]:
    """Decode a list of [S, T_i] posteriorgram tracks together on one chip
    (or, with `mesh`, tracks sharded over the mesh's "data" axis — see
    viterbi_decode_batch_pallas_logobs).

    Pads N and T to geometric shape buckets (utils.shape_bucket) so a
    mixed-length corpus compiles O(log T) kernel shapes instead of one per
    distinct length; padded frames/tracks are masked by the per-track
    lengths, so returned paths are unchanged — still bit-identical to the
    oracle. When the transition matrix has the banded+constant-coupling
    structure of the shaped melody HMMs (and allow_banded), the forward
    pass runs the exact banded fast path (see viterbi_banded.py)."""
    from ..utils import shape_bucket

    S = np.asarray(transition_matrix).shape[0]
    P = _round_up(S, LANE)
    log_B, log_pi = prepare_log_params(transition_matrix, prob_init, pad_to=P)

    lengths = [np.asarray(p).shape[1] for p in probs_st_list]
    N_real = len(probs_st_list)
    # every device's track shard must itself be a sublane-tile multiple
    n_quantum = 8 * (int(mesh.shape["data"]) if mesh is not None else 1)
    N = shape_bucket(max(N_real, 1), quantum=n_quantum, ratio=2.0)
    T_pad = shape_bucket(max(lengths), quantum=block_frames)
    obs = np.zeros((N, T_pad, P), np.float32)
    for i, p in enumerate(probs_st_list):
        obs[i, : lengths[i], :S] = np.asarray(p, np.float32).T
    log_obs = np.log(obs + TINY)
    log_obs[:, :, S:] = NEG_PAD
    len_vec = np.asarray(lengths + [1] * (N - N_real), np.int32)
    states = viterbi_decode_batch_pallas_logobs(
        transition_matrix=transition_matrix,
        prob_init=prob_init,
        log_obs_batch=jnp.asarray(log_obs),
        lengths=len_vec,
        block_frames=block_frames,
        interpret=interpret,
        allow_banded=allow_banded,
        mesh=mesh,
    )
    states = np.asarray(states)
    return [states[i, : lengths[i]].astype(np.int64) for i in range(N_real)]


def viterbi_decode_batch_pallas_logobs(
    *,
    transition_matrix,
    prob_init,
    log_obs_batch,
    lengths,
    block_frames: int = 128,
    interpret: bool | None = None,
    allow_banded: bool = True,
    mesh=None,
):
    """Decode a padded [N, T_pad, P] batch of LOG observations (unvoiced at
    lane S-1, NEG_PAD beyond — e.g. the fused observation kernel's output).
    Returns states [N, T_pad] int32 on device.

    With `mesh` (a jax Mesh with a "data" axis), tracks shard over the data
    axis and every device runs the same kernels on its local [N/D, T_pad, P]
    shard (track-level embarrassing parallelism, SURVEY.md §2.10.2 — the
    reference's per-track eval loop, imm/main_imm.py:1139-1180, scaled
    across chips). HMM parameters replicate; states return with the batch's
    sharding. Paths are bit-identical to the single-device decode (tested on
    the CPU mesh)."""
    if mesh is not None:
        from jax.sharding import PartitionSpec as PSpec

        D = int(mesh.shape["data"])
        N_all = log_obs_batch.shape[0]
        if N_all % D or (N_all // D) % 8:
            raise ValueError(
                f"N={N_all} tracks must split into data={D} shards of "
                f"sublane-tile multiples (8)"
            )

        def _local(obs_shard, len_shard):
            return viterbi_decode_batch_pallas_logobs(
                transition_matrix=transition_matrix,
                prob_init=prob_init,
                log_obs_batch=obs_shard,
                lengths=len_shard,
                block_frames=block_frames,
                interpret=interpret,
                allow_banded=allow_banded,
            )

        fn = jax.jit(
            jax.shard_map(
                _local,
                mesh=mesh,
                in_specs=(PSpec("data", None, None), PSpec("data")),
                out_specs=PSpec("data", None),
                # pallas_call out_shapes carry no vma annotations
                check_vma=False,
            )
        )
        return fn(jnp.asarray(log_obs_batch), jnp.asarray(lengths, jnp.int32))

    S = np.asarray(transition_matrix).shape[0]
    N, T_pad, P = log_obs_batch.shape
    assert P == _round_up(S, LANE)
    log_B, log_pi = prepare_log_params(transition_matrix, prob_init, pad_to=P)

    log_B_d = jnp.asarray(log_B)
    bstruct = None
    if allow_banded:
        from .viterbi_banded import extract_banded_structure

        bstruct = extract_banded_structure(np.asarray(transition_matrix), P)
    if bstruct is not None:
        from .viterbi_banded import viterbi_forward_pallas_banded_batch

        t1_last, t1m1 = viterbi_forward_pallas_banded_batch(
            bstruct, jnp.asarray(log_pi), log_obs_batch, lengths,
            block_frames=block_frames, interpret=interpret,
        )
    else:
        t1_last, t1m1 = viterbi_forward_pallas_batch(
            log_B_d, jnp.asarray(log_pi), log_obs_batch, lengths,
            block_frames=block_frames, interpret=interpret,
        )
    # first-max argmax on device (jnp.argmax picks the first maximum, like
    # np.argmax); slicing to [:S] excludes the NEG_PAD lanes. Keeping this
    # on device avoids a host round trip between the forward and backtrace
    # kernels (~20 ms through the async TPU host per batch).
    last_states = jnp.argmax(t1_last[:, :S], axis=1).astype(jnp.int32)
    if bstruct is not None and bstruct.classes:
        from .viterbi_banded import viterbi_backtrace_pallas_banded_batch

        return viterbi_backtrace_pallas_banded_batch(
            bstruct, t1m1, last_states, lengths,
            block_frames=block_frames, interpret=interpret,
        )
    return viterbi_backtrace_pallas_batch(
        t1m1, log_B_d, last_states, lengths,
        block_frames=block_frames, interpret=interpret,
    )


def viterbi_decode_batch_pallas_fused_obs(
    *,
    transition_matrix,
    prob_init,
    logits_padded,
    lengths,
    obs: dict,
    block_frames: int = 64,
    interpret: bool | None = None,
    mesh=None,
):
    """Serving fast path: decode a padded [N, T_pad, P] batch of
    REFLECT-PADDED RAW LOGITS (hmm.obs_pallas.pad_logits_reflect layout)
    with the observation model computed INSIDE the banded forward kernel
    (viterbi_forward_pallas_banded_batch_obs) — one [N, T, P] HBM round
    trip less than obs-kernel -> forward. Falls back to the two-kernel
    chain when the transition has no banded structure.

    obs: see viterbi_forward_pallas_banded_batch_obs. Same states as the
    two-kernel chain (identical obs math; tested bit-equal)."""
    if mesh is not None:
        from jax.sharding import PartitionSpec as PSpec

        D = int(mesh.shape["data"])
        N_all = logits_padded.shape[0]
        if N_all % D or (N_all // D) % 8:
            raise ValueError(
                f"N={N_all} tracks must split into data={D} shards of "
                f"sublane-tile multiples (8)"
            )

        def _local(logits_shard, len_shard):
            return viterbi_decode_batch_pallas_fused_obs(
                transition_matrix=transition_matrix,
                prob_init=prob_init,
                logits_padded=logits_shard,
                lengths=len_shard,
                obs=obs,
                block_frames=block_frames,
                interpret=interpret,
            )

        fn = jax.jit(
            jax.shard_map(
                _local,
                mesh=mesh,
                in_specs=(PSpec("data", None, None), PSpec("data")),
                out_specs=PSpec("data", None),
                check_vma=False,
            )
        )
        return fn(jnp.asarray(logits_padded), jnp.asarray(lengths, jnp.int32))

    S = np.asarray(transition_matrix).shape[0]
    n_bins = S - 1
    N, T_pad, P = logits_padded.shape
    assert P == _round_up(S, LANE)
    log_B, log_pi = prepare_log_params(transition_matrix, prob_init, pad_to=P)

    from .viterbi_banded import extract_banded_structure

    bstruct = extract_banded_structure(np.asarray(transition_matrix), P)
    if bstruct is None:
        # no banded structure: standalone obs kernel + dense decode
        from .obs_pallas import shaun_log_obs_pallas, softmax_log_obs_pallas

        if obs["method"] == "shaun":
            log_obs = shaun_log_obs_pallas(
                logits_padded, n_bins, int(obs["spw"]),
                obs["threshold_logit"], obs.get("p", 0.8),
                obs.get("scale", 2.0), block_frames=32, interpret=interpret,
            )
        else:
            log_obs = softmax_log_obs_pallas(
                logits_padded, n_bins, int(obs["spw"]),
                obs["threshold_logit"], obs.get("init_probs"),
                scaled=(obs["method"] == "softmax-scaled"),
                block_frames=32, interpret=interpret,
            )
        return viterbi_decode_batch_pallas_logobs(
            transition_matrix=transition_matrix,
            prob_init=prob_init,
            log_obs_batch=log_obs,
            lengths=lengths,
            block_frames=block_frames,
            interpret=interpret,
            allow_banded=False,
        )

    from .viterbi_banded import (
        viterbi_backtrace_pallas_banded_batch,
        viterbi_forward_pallas_banded_batch_obs,
    )

    t1_last, t1m1 = viterbi_forward_pallas_banded_batch_obs(
        bstruct, jnp.asarray(log_pi), logits_padded, lengths, obs,
        block_frames=block_frames, interpret=interpret,
    )
    last_states = jnp.argmax(t1_last[:, :S], axis=1).astype(jnp.int32)
    if bstruct.classes:
        return viterbi_backtrace_pallas_banded_batch(
            bstruct, t1m1, last_states, lengths,
            block_frames=block_frames, interpret=interpret,
        )
    return viterbi_backtrace_pallas_batch(
        t1m1, jnp.asarray(log_B), last_states, lengths,
        block_frames=block_frames, interpret=interpret,
    )
