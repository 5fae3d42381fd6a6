"""Multi-device Viterbi decoding over a jax mesh.

Two parallelism seams (SURVEY.md §2.10, BASELINE.json config 5):

1. `decode_tracks_sharded` — track-level data parallelism: a batch of
   tracks is sharded over the "data" axis; each device decodes its tracks
   locally (vmap over the lax.scan DP). The reference's eval loops iterate
   tracks one by one (imm/main_imm.py:1139-1180); here they run P-wide.

2. `viterbi_sharded_time_blocks` — sequence parallelism for one long
   track: the T axis is sharded into per-device blocks; each device
   receives an observation HALO on both sides via ppermute (the same
   overlap-save idea the reference's NSGT long-audio blocking uses,
   dcnet/nsgt.py:420-505), runs a cold-start forward DP through the left
   halo so the max-plus carry "forgets" the unknown boundary (weak
   ergodicity of the banded transition structure), backtraces through the
   right halo so the pointer chase likewise merges, and keeps only its own
   block. A seam-consistency flag per boundary reports whether adjacent
   devices agreed on the cross-boundary chase — callers can assert it to
   certify the decode equals the single-device path.

Both run under shard_map and compile on a CPU-simulated mesh
(xla_force_host_platform_device_count) as well as real slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..hmm.viterbi import viterbi_backtrace_jax, viterbi_forward_jax


def _local_decode_batch(log_B, log_pi, log_obs_batch):
    """[N, T, S] -> [N, T] int32, plain scan DP per track."""

    def one(log_obs):
        t1_last, T2 = viterbi_forward_jax(log_B, log_pi, log_obs)
        last = jnp.argmax(t1_last).astype(jnp.int32)
        return viterbi_backtrace_jax(T2, last)

    return jax.vmap(one)(log_obs_batch)


def decode_tracks_sharded(log_B, log_pi, log_obs_batch, mesh: Mesh):
    """Decode a [N, T, S] batch of tracks, N sharded over the "data" axis.

    Params are replicated; returns [N, T] int32 states with the same
    sharding as the input batch.
    """
    fn = jax.jit(
        jax.shard_map(
            lambda B, pi, obs: _local_decode_batch(B, pi, obs),
            mesh=mesh,
            in_specs=(P(), P(), P("data", None, None)),
            out_specs=P("data", None),
        )
    )
    return fn(log_B, log_pi, log_obs_batch)


def _forward_with_reset(log_B, log_pi, log_obs, reset_row):
    """Forward DP over a window, with the carry re-initialized to
    log_pi + obs at `reset_row` (-1 = no reset). Returns T1m1 rows
    (T1m1[j] = T1 row BEFORE frame j, i.e. T1[j-1]) and the final T1."""
    S = log_B.shape[0]

    def step(carry, inp):
        row_idx, obs_row = inp
        prev = carry
        scores = prev[None, :] + log_B  # [s, s']
        m = jnp.max(scores, axis=1)
        new = m + obs_row
        new = jnp.where(row_idx == reset_row, log_pi + obs_row, new)
        return new, prev

    T = log_obs.shape[0]
    rows = jnp.arange(T)
    # first frame: cold start means T1[0] = obs[0] (uniform prior)
    carry = jnp.where(reset_row == 0, log_pi + log_obs[0], log_obs[0])
    t1_last, t1m1 = jax.lax.scan(step, carry, (rows[1:], log_obs[1:]))
    t1m1 = jnp.concatenate([jnp.zeros((1, S), jnp.float32), t1m1], axis=0)
    return t1m1, t1_last


def _backtrace_reconstruct(log_B, t1m1, start_row, start_state):
    """Chase backpointers from (start_row, start_state) down to row 0,
    reconstructing each pointer from the stored T1m1 row:
    s_{j-1} = first-argmax(t1m1[j] + log_B[s_j]). Rows above start_row get
    garbage (masked by construction). Returns states [T]."""
    T, S = t1m1.shape
    lane = jnp.arange(S, dtype=jnp.int32)

    def step(s, inp):
        row_idx, t1_row = inp
        active = row_idx <= start_row
        s = jnp.where(row_idx == start_row, start_state, s)
        out = s
        cand = t1_row + log_B[s]
        m = jnp.max(cand)
        bp = jnp.min(jnp.where(cand == m, lane, S)).astype(jnp.int32)
        s = jnp.where(active, bp, s)
        return s, out

    rows = jnp.arange(T)
    # derive the init from start_state so its device-varying type matches
    # the carry under shard_map
    _, states = jax.lax.scan(step, start_state * 0, (rows, t1m1), reverse=True)
    return states


@functools.partial(jax.jit, static_argnames=("mesh", "halo", "axis"))
def viterbi_sharded_time_blocks(log_B, log_pi, log_obs, mesh: Mesh, halo: int, axis: str = "seq"):
    """Decode one [T, S] track with T sharded over `axis` of `mesh`.

    T must divide evenly by the axis size. Returns (states [T] int32,
    seams_ok [n_blocks-1] bool): seams_ok[i] certifies that block i+1's
    warm-up chase agreed with block i's decoded tail, i.e. the halo was
    long enough for the max-plus recursion to forget the block boundary.
    """
    n_blocks = mesh.shape[axis]

    def block_fn(log_B, log_pi, obs_local):
        obs_local = obs_local  # [L, S]
        L, S = obs_local.shape
        idx = jax.lax.axis_index(axis)
        H = halo

        # halo exchange: left halo = prev block's last H rows; right halo =
        # next block's first H rows
        fwd_perm = [(i, (i + 1) % n_blocks) for i in range(n_blocks)]
        bwd_perm = [(i, (i - 1) % n_blocks) for i in range(n_blocks)]
        left_halo = jax.lax.ppermute(obs_local[-H:], axis, fwd_perm)
        right_halo = jax.lax.ppermute(obs_local[:H], axis, bwd_perm)
        window = jnp.concatenate([left_halo, obs_local, right_halo], axis=0)

        is_first = idx == 0
        is_last = idx == n_blocks - 1
        # device 0: exact start at window row H (its true frame 0)
        reset_row = jnp.where(is_first, H, -1)
        t1m1, t1_last = _forward_with_reset(log_B, log_pi, window, reset_row)

        # backtrace start: last device starts at its true final frame
        # (row H + L - 1); others at the end of the right halo
        start_row = jnp.where(is_last, H + L - 1, H + L + H - 1)
        t1_at_start = jnp.where(
            is_last,
            # T1 at row H+L-1 = t1m1[H+L] except when that's out of local
            # storage; recompute from t1m1[H+L-1] + transition + obs:
            _t1_at(log_B, t1m1, window, H + L - 1, log_pi, reset_row),
            _t1_at(log_B, t1m1, window, H + L + H - 1, log_pi, reset_row),
        )
        start_state = jnp.argmax(t1_at_start).astype(jnp.int32)
        states_win = _backtrace_reconstruct(log_B, t1m1, start_row, start_state)
        states_local = states_win[H : H + L]

        # seam check: my chase continued below my block start gives the
        # state for the previous block's last frame; compare with what the
        # previous block decoded for that frame.
        # --- convergence certificate, two necessary conditions ---
        # (a) overlap agreement: my decode of my right-halo frames must equal
        #     the next block's decode of its first H kept frames.
        my_right_halo_states = states_win[H + L : H + L + H]
        prev_halo_states = jax.lax.ppermute(my_right_halo_states, axis, fwd_perm)
        overlap_ok = jnp.all(prev_halo_states == states_local[:H])
        # (b) boundary backpointer-row agreement: the bp row for my first
        #     frame computed from my cold-started T1 must equal the row the
        #     previous block computes from its warm T1 for the same frame.
        my_bp_row = _bp_row(log_B, t1m1[H])
        warm_bp_row = jax.lax.ppermute(_bp_row(log_B, t1m1[H + L]), axis, fwd_perm)
        bp_ok = jnp.all(my_bp_row == warm_bp_row)
        seam_ok = jnp.where(idx == 0, True, jnp.logical_and(overlap_ok, bp_ok))
        return states_local, seam_ok[None]

    states, seams = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None)),
        out_specs=(P(axis), P(axis)),
    )(log_B, log_pi, log_obs)
    # seams[0] is device 0's trivially-true flag; real seams are 1..n-1
    return states, seams[1:]


def viterbi_decode_time_sharded(
    log_B,
    log_pi,
    log_obs,
    mesh: Mesh,
    halo: int = 64,
    max_halo: int = 4096,
    axis: str = "seq",
):
    """Certified time-sharded decode: runs `viterbi_sharded_time_blocks`
    and doubles the halo until every seam certificate passes (or max_halo
    is reached, falling back to the exact single-device decode).

    Returns (states [T] int32, final_halo or -1 for the fallback).
    """
    L = log_obs.shape[0] // mesh.shape[axis]
    h = halo
    while h <= max_halo and h < L:
        states, seams = viterbi_sharded_time_blocks(
            log_B, log_pi, log_obs, mesh, halo=h, axis=axis
        )
        if bool(jnp.all(seams)):
            return states, h
        h *= 2
    # fallback: exact single-device decode
    t1_last, T2 = viterbi_forward_jax(log_B, log_pi, log_obs)
    last = jnp.argmax(t1_last).astype(jnp.int32)
    return viterbi_backtrace_jax(T2, last), -1


def _bp_row(log_B, t1_prev_row):
    """Backpointer row for a frame given T1 of the previous frame:
    bp[s] = first-argmax_{s'} (T1prev[s'] + log_B[s, s'])."""
    S = log_B.shape[0]
    scores = t1_prev_row[None, :] + log_B
    m = jnp.max(scores, axis=1)
    lane = jnp.arange(S, dtype=jnp.int32)
    return jnp.min(
        jnp.where(scores == m[:, None], lane[None, :], S), axis=1
    ).astype(jnp.int32)


def _t1_at(log_B, t1m1, window_obs, row, log_pi, reset_row):
    """T1 at `row` = one DP step applied to t1m1[row] (which is T1[row-1])
    plus the row's observation; honors the device-0 reset and row 0 cold
    start."""
    prev = t1m1[row]
    scores = prev[None, :] + log_B
    m = jnp.max(scores, axis=1)
    t1 = m + window_obs[row]
    t1 = jnp.where(row == reset_row, log_pi + window_obs[row], t1)
    t1 = jnp.where((row == 0) & (reset_row != 0), window_obs[row], t1)
    return t1


def viterbi_sharded_time_blocks_pallas(
    log_B_padded,
    log_pi_padded,
    log_obs_padded,
    mesh: Mesh,
    halo: int,
    S: int,
    axis: str = "seq",
    interpret: bool | None = None,
):
    """Sequence-parallel decode running the PALLAS kernels per device.

    Same halo/certificate scheme as `viterbi_sharded_time_blocks`, but each
    block's forward DP and backtrace run the production Pallas kernels
    (forward reset-row support gives block 0 its exact mid-window start).
    Inputs are LANE-PADDED: log_B/log_pi padded to P (prepare_log_params
    pad_to), log_obs [T, P] with padded lanes at NEG_PAD; `S` is the true
    state count. T/halo must be multiples of 16 (kernel group size).

    Returns (states [T] int32, seams_ok [n_blocks-1] bool).
    """
    from ..hmm.viterbi_pallas import (
        GROUP,
        viterbi_backtrace_pallas,
        viterbi_forward_pallas,
    )

    n_blocks = mesh.shape[axis]
    T, P = log_obs_padded.shape
    L = T // n_blocks
    H = halo
    if H % GROUP or L % GROUP:
        raise ValueError("halo and per-block length must be multiples of 16")
    W = H + L + H

    def block_fn(log_B, log_pi, obs_local):
        idx = jax.lax.axis_index(axis)
        fwd_perm = [(i, (i + 1) % n_blocks) for i in range(n_blocks)]
        bwd_perm = [(i, (i - 1) % n_blocks) for i in range(n_blocks)]
        left_halo = jax.lax.ppermute(obs_local[-H:], axis, fwd_perm)
        right_halo = jax.lax.ppermute(obs_local[:H], axis, bwd_perm)
        window = jnp.concatenate([left_halo, obs_local, right_halo], axis=0)

        is_first = idx == 0
        is_last = idx == n_blocks - 1
        reset_row = jnp.where(is_first, H, -1)
        T_eff = jnp.where(is_last, H + L, W)

        t1_last, t1m1 = viterbi_forward_pallas(
            log_B, log_pi, window, T_eff, reset_row,
            block_frames=GROUP, interpret=interpret,
        )
        masked = jnp.where(jnp.arange(P) < S, t1_last, -jnp.inf)
        start_state = jnp.argmax(masked).astype(jnp.int32)
        states_win = viterbi_backtrace_pallas(
            t1m1, log_B, start_state, T_eff,
            block_frames=GROUP, interpret=interpret,
        )
        states_local = states_win[H : H + L]

        # seam certificate (same two conditions as the scan variant)
        my_right_halo_states = states_win[H + L : H + L + H]
        prev_halo_states = jax.lax.ppermute(my_right_halo_states, axis, fwd_perm)
        overlap_ok = jnp.all(prev_halo_states == states_local[:H])
        my_bp_row = _bp_row(log_B[:S, :S], t1m1[H][:S])
        warm_bp_row = jax.lax.ppermute(
            _bp_row(log_B[:S, :S], t1m1[H + L][:S]), axis, fwd_perm
        )
        bp_ok = jnp.all(my_bp_row == warm_bp_row)
        seam_ok = jnp.where(idx == 0, True, jnp.logical_and(overlap_ok, bp_ok))
        return states_local.astype(jnp.int32), seam_ok[None]

    from jax.sharding import PartitionSpec as PS

    states, seams = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(PS(), PS(), PS(axis, None)),
        out_specs=(PS(axis), PS(axis)),
        # pallas_call outputs carry no varying-mesh-axes metadata
        check_vma=False,
    )(log_B_padded, log_pi_padded, log_obs_padded)
    return states, seams[1:]
