"""Runtime utilities: logging, profiling, distributed initialization.

Aux subsystems the framework adds beyond the reference (SURVEY.md §5 lists
the reference as having essentially none):

- configure_logging — the reference's DEBUG-gated logging with per-library
  suppression (dcnet/softmax_viterbi.py:89-123), stdlib-only,
- Timer / profile_trace — wall-clock timing and jax.profiler traces for the
  hot paths (the reference only ad-hoc time.time()s its Viterbi variants),
- initialize_distributed — jax distributed runtime bring-up for multi-host
  slices (ICI within a slice, DCN across hosts),
- device_summary — chip inventory for logs,
- shape_bucket — the geometric padded-shape policy that bounds XLA/Mosaic
  recompilation on ragged real-corpus shapes (every jit specializes on
  shape, and remote TPU compiles cost 30-300 s: an arbitrary-length
  per-track eval like the reference's imm/main_imm.py:1139-1180 must pad
  to O(log T) buckets instead of compiling per length).
"""

from __future__ import annotations

import contextlib
import logging
import time


def shape_bucket(
    n: int, quantum: int, ratio: float = 1.25, minimum: int | None = None
) -> int:
    """Smallest bucket >= n from the geometric grid {minimum, ~ratio x, ...}
    where every bucket is a multiple of `quantum`.

    Buckets waste at most ~(ratio-1) padded compute while keeping the number
    of distinct compiled shapes O(log n / log ratio). quantum keeps padded
    dims tile-friendly (frame-block multiples for the decoders, lane
    multiples for NMF frame columns)."""
    if n <= 0:
        raise ValueError(f"shape_bucket needs n >= 1, got {n}")
    b = minimum if minimum is not None else quantum
    assert b % quantum == 0 and b > 0
    while b < n:
        # the +quantum floor guarantees progress when int(b * ratio)
        # rounds back to a multiple of quantum <= b (e.g. small quantum)
        b = max(-(-int(b * ratio) // quantum) * quantum, b + quantum)
    return b


def configure_logging(debug: bool = False) -> None:
    logging.basicConfig(
        level=logging.DEBUG if debug else logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    for noisy in ("jax", "jax._src", "absl", "matplotlib", "orbax"):
        logging.getLogger(noisy).setLevel(logging.WARNING)


class Timer:
    """Accumulating wall-clock timer: `with timer.span("viterbi"): ...`."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name}: {tot:.3f}s total, {n} calls, {tot/n*1e3:.2f} ms/call")
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard/XProf elsewhere)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up the jax distributed runtime for multi-host slices. With no
    arguments, relies on the TPU environment's auto-detection; single-host
    runs are a no-op."""
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def device_summary() -> str:
    import jax

    devs = jax.devices()
    kinds: dict[str, int] = {}
    for d in devs:
        kinds[d.device_kind] = kinds.get(d.device_kind, 0) + 1
    parts = [f"{n}x {k}" for k, n in kinds.items()]
    return (
        f"{len(devs)} devices ({', '.join(parts)}), "
        f"{jax.process_count()} process(es)"
    )
