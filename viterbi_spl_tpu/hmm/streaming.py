"""Streaming (fixed-lag) Viterbi decoding for online serving.

The reference decodes whole tracks offline. For production streaming this
module adds a fixed-lag smoother: observations arrive in chunks, the
forward DP runs incrementally, and states are emitted once they are `lag`
frames behind the newest observation by backtracing from the current best
state through the buffered window.

Properties:
- with lag >= track length the output equals the offline decode exactly
  (same DP, same first-max tie-breaking),
- with finite lag, decisions can differ from the offline path only where
  the max-plus recursion has not yet merged within the lag window — the
  same convergence property the sequence-parallel halo decode exploits
  (dist/sharded_viterbi.py); melody HMMs merge in tens of frames,
- `flush()` emits the remaining tail exactly.

The per-chunk forward is the jittable lax.scan DP; the state is small
(one [S] carry + a [lag, S] ring of shifted T1 rows), so a serving process
can hold many concurrent streams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .viterbi import TINY, prepare_log_params


@jax.jit
def _forward_chunk(log_B, carry, log_obs):
    """Scan a chunk: returns (new_carry, t1m1_rows [T_c, S]) where row j is
    T1 BEFORE frame j (i.e. the carry at entry of frame j)."""

    def step(c, obs_row):
        prev = c
        scores = prev[None, :] + log_B
        m = jnp.max(scores, axis=1)
        return m + obs_row, prev

    return jax.lax.scan(step, carry, log_obs)


@jax.jit
def _backtrace_window(log_B, t1m1_rows, last_state):
    """Chase from last_state through the buffered rows (reverse), returning
    states for every buffered frame."""
    S = log_B.shape[0]
    lane = jnp.arange(S, dtype=jnp.int32)

    def step(s_next, t1_row):
        cand = t1_row + log_B[s_next]
        m = jnp.max(cand)
        bp = jnp.min(jnp.where(cand == m, lane, S)).astype(jnp.int32)
        return bp, bp  # emit the CHASED state (frame j-1's state at row j)

    _, states = jax.lax.scan(step, last_state, t1m1_rows[1:], reverse=True)
    return jnp.concatenate([states, last_state[None]])


class StreamingViterbi:
    """Fixed-lag streaming decoder.

    push(obs_chunk [T_c, S]) -> [n_emitted] int32 states (frames emitted in
    order); flush() -> remaining states. Total emissions == total frames.
    """

    def __init__(self, transition_matrix, prob_init, lag: int = 128):
        if lag < 1:
            raise ValueError("lag must be >= 1")
        log_B, log_pi = prepare_log_params(transition_matrix, prob_init)
        self._log_B = jnp.asarray(log_B)
        self._log_pi = jnp.asarray(log_pi)
        self.S = log_B.shape[0]
        self.lag = lag
        self._carry = None  # T1 row after the newest frame
        self._window: list[np.ndarray] = []  # shifted T1 rows for buffered frames
        self._obs_count = 0
        self._emitted = 0

    def push(self, obs_chunk: np.ndarray, is_log: bool = False) -> np.ndarray:
        obs = jnp.asarray(obs_chunk, jnp.float32)
        if not is_log:
            obs = jnp.log(obs + TINY)
        if obs.ndim != 2 or obs.shape[1] != self.S:
            raise ValueError(f"expected [T, {self.S}] observations")

        if self._carry is None:
            first = self._log_pi + obs[0]
            self._window.append(np.zeros(self.S, np.float32))  # unused row 0
            carry, rows = _forward_chunk(self._log_B, first, obs[1:])
            self._window.extend(np.asarray(rows))
            self._carry = carry
        else:
            carry, rows = _forward_chunk(self._log_B, self._carry, obs)
            self._window.extend(np.asarray(rows))
            self._carry = carry
        self._obs_count += obs.shape[0]

        n_ready = (self._obs_count - self._emitted) - self.lag
        if n_ready <= 0:
            return np.empty(0, np.int32)
        return self._emit(n_ready)

    def _emit(self, n: int) -> np.ndarray:
        last_state = jnp.argmax(self._carry).astype(jnp.int32)
        rows = jnp.asarray(np.stack(self._window))
        states = np.asarray(_backtrace_window(self._log_B, rows, last_state))
        out = states[:n].astype(np.int32)
        del self._window[:n]
        self._emitted += n
        return out

    def flush(self) -> np.ndarray:
        if self._carry is None:
            return np.empty(0, np.int32)
        n = self._obs_count - self._emitted
        if n <= 0:
            return np.empty(0, np.int32)
        return self._emit(n)


_forward_chunk_batch = jax.jit(jax.vmap(_forward_chunk, in_axes=(None, 0, 0)))
_backtrace_window_batch = jax.jit(
    jax.vmap(_backtrace_window, in_axes=(None, 0, 0))
)


class StreamingViterbiBatch:
    """Fixed-lag streaming decoder for M synchronized concurrent streams —
    the production serving shape (a pool of live audio channels stepping in
    lockstep). One device dispatch per push for ALL streams: the forward
    scan and the backtrace window are vmapped over the stream axis and the
    carry/window state stays on device between pushes (no per-stream host
    round trips — through the axon async host a single host sync costs
    ~25 ms, which at 10 ms hops would stall dozens of live channels).

    push(obs [M, T_c, S]) -> [M, n] int32 states; every stream emits the
    same frame count per push (synchronized hops), so emission bookkeeping
    is host-static and each steady-state push compiles exactly once.
    Per-stream decisions are bit-identical to StreamingViterbi (the vmap
    computes the same f32 ops lane-wise; tested), hence equal to the
    offline decode whenever the lag covers the stream.
    """

    def __init__(self, transition_matrix, prob_init, n_streams: int, lag: int = 128):
        if lag < 1:
            raise ValueError("lag must be >= 1")
        if n_streams < 1:
            raise ValueError("n_streams must be >= 1")
        log_B, log_pi = prepare_log_params(transition_matrix, prob_init)
        self._log_B = jnp.asarray(log_B)
        self._log_pi = jnp.asarray(log_pi)
        self.S = log_B.shape[0]
        self.M = n_streams
        self.lag = lag
        self._carry = None  # [M, S] T1 rows after the newest frame
        self._window = None  # [M, B, S] shifted T1 rows for buffered frames
        self._obs_count = 0
        self._emitted = 0

    def push(self, obs_chunk: np.ndarray, is_log: bool = False) -> np.ndarray:
        obs = jnp.asarray(obs_chunk, jnp.float32)
        if not is_log:
            obs = jnp.log(obs + TINY)
        if obs.ndim != 3 or obs.shape[0] != self.M or obs.shape[2] != self.S:
            raise ValueError(f"expected [{self.M}, T, {self.S}] observations")

        if self._carry is None:
            first = self._log_pi[None, :] + obs[:, 0]
            carry, rows = _forward_chunk_batch(self._log_B, first, obs[:, 1:])
            # row 0 (T1 before frame 0) is unused by the backtrace
            rows = jnp.concatenate(
                [jnp.zeros((self.M, 1, self.S), jnp.float32), rows], axis=1
            )
            self._window = rows
        else:
            carry, rows = _forward_chunk_batch(self._log_B, self._carry, obs)
            self._window = jnp.concatenate([self._window, rows], axis=1)
        self._carry = carry
        self._obs_count += obs.shape[1]

        n_ready = (self._obs_count - self._emitted) - self.lag
        if n_ready <= 0:
            return np.empty((self.M, 0), np.int32)
        return self._emit(n_ready)

    def _emit(self, n: int) -> np.ndarray:
        last = jnp.argmax(self._carry, axis=1).astype(jnp.int32)
        states = _backtrace_window_batch(self._log_B, self._window, last)
        out = np.asarray(states[:, :n], np.int32)
        self._window = self._window[:, n:]
        self._emitted += n
        return out

    def flush(self) -> np.ndarray:
        if self._carry is None:
            return np.empty((self.M, 0), np.int32)
        n = self._obs_count - self._emitted
        if n <= 0:
            return np.empty((self.M, 0), np.int32)
        return self._emit(n)
