"""Device-mesh helpers.

The framework scales along the two seams the reference's structure exposes
(SURVEY.md §2.10): track-level data parallelism ("data" axis) and
time-block sequence parallelism with halos ("seq" axis). Collectives ride
ICI inside a slice; jax's distributed runtime covers DCN across hosts.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int | None = None, seq: int = 1, devices=None) -> Mesh:
    """Mesh over (data, seq). data defaults to n_devices // seq."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        if n % seq != 0:
            raise ValueError(f"{n} devices not divisible by seq={seq}")
        data = n // seq
    if data * seq > n:
        raise ValueError(f"mesh {data}x{seq} needs more than {n} devices")
    grid = np.asarray(devices[: data * seq]).reshape(data, seq)
    return Mesh(grid, ("data", "seq"))
