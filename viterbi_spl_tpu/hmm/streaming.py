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


def _round_up(n: int, q: int) -> int:
    return -(-n // q) * q


class StreamingViterbiBatch:
    """Fixed-lag streaming decoder for M synchronized concurrent streams —
    the production serving shape (a pool of live audio channels stepping in
    lockstep). One device dispatch per push for ALL streams, and the DP
    rides the SAME batched Pallas kernels as offline decoding (banded fast
    path when the transition structure allows, dense kernels otherwise):

    - forward continuation is exact via carry injection: the carry row is
      prepended as a pseudo-frame decoded against a ZERO log-prior, and
      fl(0 + x) == x bitwise for log-probs, so the kernel's T1 chain
      continues the stream's DP exactly;
    - the emission backtrace runs the batched backtrace kernel over the
      buffered shifted-T1 window.

    The carry/window state stays on device between pushes (through the
    axon async host a single host sync costs ~25 ms, which at 10 ms hops
    would stall dozens of live channels; the only per-push sync is reading
    the emitted states, which serving consumes anyway).

    push(obs [M, T_c, S]) -> [M, n] int32 states; every stream emits the
    same frame count per push (synchronized hops), so emission bookkeeping
    is host-static and each steady-state push shape compiles exactly once
    (keep T_c fixed in production). Per-stream decisions are bit-identical
    to StreamingViterbi (tested), hence equal to the offline decode
    whenever the lag covers the stream.

    use_kernels=False (or M not a multiple of 8, the sublane tile) falls
    back to the vmapped lax.scan path — same results, any backend.
    """

    def __init__(
        self,
        transition_matrix,
        prob_init,
        n_streams: int,
        lag: int = 128,
        use_kernels: bool | None = None,
        block_frames: int = 16,
        interpret: bool | None = None,
    ):
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
        self._carry = None  # [M, S or P] T1 rows after the newest frame
        self._window = None  # [M, B, S or P] shifted T1 rows (buffered)
        self._obs_count = 0
        self._emitted = 0

        if use_kernels is None:
            use_kernels = n_streams % 8 == 0
        self._use_kernels = bool(use_kernels) and n_streams % 8 == 0
        self._block = block_frames
        self._interpret = interpret
        if self._use_kernels:
            from .viterbi_banded import extract_banded_structure
            from .viterbi_pallas import LANE

            self.P = _round_up(self.S, LANE)
            self._bs = extract_banded_structure(
                np.asarray(transition_matrix, np.float32), self.P
            )
            log_B_p, log_pi_p = prepare_log_params(
                transition_matrix, prob_init, pad_to=self.P
            )
            self._log_B_p = jnp.asarray(log_B_p)
            self._log_pi_p = jnp.asarray(log_pi_p)
            self._zero_pi = jnp.zeros((self.P,), jnp.float32)
            # one device dispatch per push: the whole step (lane pad, carry
            # injection, forward kernel, window update, emission backtrace)
            # compiles into a single program per (shape, n_emit) signature
            self._jit_step_first = jax.jit(
                self._step_first_impl, static_argnames=("is_log", "n_emit")
            )
            self._jit_step_next = jax.jit(
                self._step_next_impl, static_argnames=("is_log", "n_emit")
            )

    def push(self, obs_chunk: np.ndarray, is_log: bool = False) -> np.ndarray:
        out = self.push_device(obs_chunk, is_log=is_log)
        if out is None:
            return np.empty((self.M, 0), np.int32)
        return np.asarray(out, np.int32)

    def push_device(self, obs_chunk, is_log: bool = False):
        """push() without the host readback: returns the emitted states as
        a DEVICE array [M, n_emitted] (or None when nothing is ready yet).
        The per-push host sync is the dominant cost on a high-latency host
        (~25 ms through the axon tunnel vs sub-ms device compute) —
        serving loops that can tolerate burst emission should drain
        through StreamingDrain instead of reading every push."""
        if (
            np.ndim(obs_chunk) != 3
            or obs_chunk.shape[0] != self.M
            or obs_chunk.shape[2] != self.S
        ):
            raise ValueError(f"expected [{self.M}, T, {self.S}] observations")
        T_c = obs_chunk.shape[1]
        n_ready = max(0, (self._obs_count + T_c - self._emitted) - self.lag)

        if self._use_kernels:
            out = self._kernel_step(obs_chunk, bool(is_log), n_ready)
        else:
            obs = jnp.asarray(obs_chunk, jnp.float32)
            if not is_log:
                obs = jnp.log(obs + TINY)
            self._push_scan(obs)
            out = self._emit_scan(n_ready) if n_ready else None
        self._obs_count += T_c
        self._emitted += n_ready
        return out

    # -- vmapped-scan path (any backend, any M) ---------------------------
    def _push_scan(self, obs) -> None:
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

    def _emit_scan(self, n: int):
        last = jnp.argmax(self._carry, axis=1).astype(jnp.int32)
        states = _backtrace_window_batch(self._log_B, self._window, last)
        out = states[:, :n]
        self._window = self._window[:, n:]
        return out

    # -- production-kernel path: ONE jitted dispatch per push --------------
    # (an eager per-op formulation measured 677 ms/push through the axon
    # async host at M=128 — every intermediate op pays dispatch latency)
    def _kernel_step(self, obs_np, is_log: bool, n_emit: int):
        first = self._carry is None
        if first:
            fn = self._jit_step_first
            out, carry, window = fn(
                jnp.asarray(obs_np), is_log=is_log, n_emit=n_emit
            )
        else:
            fn = self._jit_step_next
            out, carry, window = fn(
                jnp.asarray(obs_np), self._carry, self._window,
                is_log=is_log, n_emit=n_emit,
            )
        self._carry = carry
        self._window = window
        return out

    def _forward_kernel(self, rows_in, log_pi, n_real):
        from .viterbi_banded import viterbi_forward_pallas_banded_batch
        from .viterbi_pallas import viterbi_forward_pallas_batch

        M = rows_in.shape[0]
        T_pad = _round_up(n_real, self._block)
        if T_pad > n_real:
            from .viterbi import NEG_PAD

            rows_in = jnp.concatenate(
                [rows_in,
                 jnp.full((M, T_pad - n_real, self.P), NEG_PAD, jnp.float32)],
                axis=1,
            )
        lengths = np.full(M, n_real, np.int32)
        if self._bs is not None:
            return viterbi_forward_pallas_banded_batch(
                self._bs, log_pi, rows_in, lengths,
                block_frames=self._block, interpret=self._interpret,
            )
        return viterbi_forward_pallas_batch(
            self._log_B_p, log_pi, rows_in, lengths,
            block_frames=self._block, interpret=self._interpret,
        )

    def _emit_kernel(self, carry, window, n_emit: int):
        from .viterbi_banded import viterbi_backtrace_pallas_banded_batch
        from .viterbi_pallas import viterbi_backtrace_pallas_batch

        M, B, P = window.shape
        B_pad = _round_up(B, self._block)
        win = window
        if B_pad > B:
            win = jnp.concatenate(
                [win, jnp.zeros((M, B_pad - B, P), jnp.float32)], axis=1
            )
        last = jnp.argmax(carry[:, : self.S], axis=1).astype(jnp.int32)
        lengths = np.full(M, B, np.int32)
        if self._bs is not None and self._bs.classes:
            states = viterbi_backtrace_pallas_banded_batch(
                self._bs, win, last, lengths,
                block_frames=self._block, interpret=self._interpret,
            )
        else:
            states = viterbi_backtrace_pallas_batch(
                win, self._log_B_p, last, lengths,
                block_frames=self._block, interpret=self._interpret,
            )
        return states[:, :n_emit], window[:, n_emit:]

    def _pad_lanes(self, obs):
        from .viterbi import NEG_PAD

        M, T_c, S = obs.shape
        return jnp.concatenate(
            [obs, jnp.full((M, T_c, self.P - S), NEG_PAD, jnp.float32)],
            axis=2,
        )

    def _step_first_impl(self, obs, *, is_log: bool, n_emit: int):
        if not is_log:
            obs = jnp.log(obs + TINY)
        rows_in = self._pad_lanes(obs.astype(jnp.float32))
        n_real = obs.shape[1]
        t1_last, t1m1 = self._forward_kernel(rows_in, self._log_pi_p, n_real)
        window = t1m1[:, :n_real, :]
        if n_emit:
            out, window = self._emit_kernel(t1_last, window, n_emit)
        else:
            out = None
        return out, t1_last, window

    def _step_next_impl(self, obs, carry, window, *, is_log: bool, n_emit: int):
        from .viterbi import NEG_PAD

        if not is_log:
            obs = jnp.log(obs + TINY)
        obs_p = self._pad_lanes(obs.astype(jnp.float32))
        # carry injection: pseudo-frame 0 = carry against a zero prior
        # (fl(0 + x) == x bitwise for log-probs, so the kernel continues
        # the stream's DP exactly). Pad lanes of the kernel carry hold
        # garbage by contract — sanitize them to NEG_PAD before
        # re-injecting as observations.
        lane = jnp.arange(self.P)[None, :]
        carry_inj = jnp.where(lane < self.S, carry, jnp.float32(NEG_PAD))
        rows_in = jnp.concatenate([carry_inj[:, None, :], obs_p], axis=1)
        n_real = obs.shape[1] + 1
        t1_last, t1m1 = self._forward_kernel(rows_in, self._zero_pi, n_real)
        window = jnp.concatenate([window, t1m1[:, 1:n_real, :]], axis=1)
        if n_emit:
            out, window = self._emit_kernel(t1_last, window, n_emit)
        else:
            out = None
        return out, t1_last, window

    def flush(self) -> np.ndarray:
        out = self.flush_device()
        if out is None:
            return np.empty((self.M, 0), np.int32)
        return np.asarray(out, np.int32)

    def flush_device(self):
        """flush() without the host readback (device array or None)."""
        if self._carry is None:
            return None
        n = self._obs_count - self._emitted
        if n <= 0:
            return None
        self._emitted += n
        if self._use_kernels:
            out, self._window = self._emit_kernel(self._carry, self._window, n)
        else:
            out = self._emit_scan(n)
        return out


class StreamingDrain:
    """Amortized host drain over a StreamingViterbiBatch pool.

    Reading emitted states back synchronously costs one host round trip
    per push — through the axon async host that is ~25 ms of pure
    transfer latency against sub-ms device compute (97% of round-3's
    measured push time). This wrapper keeps each push's emissions ON
    DEVICE and reads `every` pushes back in ONE transfer (a device-side
    concatenate along the frame axis), so the steady-state per-push cost
    approaches the device compute time plus RTT/every.

    push(obs) returns None between drain boundaries and the concatenated
    [M, n] states at each boundary; flush() returns everything still
    pending. Per-stream state sequences are identical to per-push
    draining — the wrapper only reorders readbacks, never the DP.

    The default every=32 is the measured optimum of the drain frontier on
    this host (scripts/tpu_streaming_bench.py, round 5): 2.7 ms/push vs
    5.2 at every=8; every=64 regresses (the drained block grows to ~4 MB
    and transfer time eats the amortization). Residual model:
    device-push + RTT/every + transfer(every*hop*M*4B).
    """

    def __init__(self, pool: "StreamingViterbiBatch", every: int = 32):
        if every < 1:
            raise ValueError("every must be >= 1")
        self.pool = pool
        self.every = int(every)
        self._outs: list = []
        self._pushes = 0

    def push(self, obs_chunk, is_log: bool = False):
        out = self.pool.push_device(obs_chunk, is_log=is_log)
        if out is not None:
            self._outs.append(out)
        self._pushes += 1
        if self._pushes % self.every == 0:
            return self._drain()
        return None

    def _drain(self) -> np.ndarray:
        if not self._outs:
            return np.empty((self.pool.M, 0), np.int32)
        cat = (
            self._outs[0]
            if len(self._outs) == 1
            else jnp.concatenate(self._outs, axis=1)
        )
        self._outs = []
        return np.asarray(cat, np.int32)

    def flush(self) -> np.ndarray:
        tail = self.pool.flush_device()
        if tail is not None:
            self._outs.append(tail)
        return self._drain()
