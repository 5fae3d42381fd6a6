"""Empirical per-primitive cost model for the banded-forward kernel shape.

Times a family of fabricated Pallas kernels with the same control shape as
the banded forward (carry [N, P], sequential frames, one row store per
frame) but a controlled per-frame op mix. The slope of time vs op count
gives the real per-op cost at [N=128, P=384] for:

  - elementwise max (distinct constants defeat CSE)
  - lane roll (+ max)
  - lane reduction (jnp.max axis=1, broadcast back)
  - the per-frame row store itself

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_vpu_probe.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/vspl_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, P, T, BLOCK, GROUP = 128, 384, 8192, 64, 16
_VMEM_LIMIT = 100 * 1024 * 1024


def make_kernel(mix: tuple, store: bool):
    kind, count = mix

    def kernel(obs_ref, t1m1_ref, carry):
        chunk = pl.program_id(0)
        _, L, _ = obs_ref.shape

        @pl.when(chunk == 0)
        def _():
            carry[:, :] = obs_ref[:, 0, :]

        prev = carry[:, :]
        for g in range(L // GROUP):
            j0 = g * GROUP
            obs_blk = obs_ref[:, pl.ds(j0, GROUP), :]
            rows = []
            for k in range(GROUP):
                obs_j = obs_blk[:, k, :]
                x = prev
                if kind == "max":
                    for i in range(count):
                        x = jnp.maximum(x, prev + np.float32(0.001 * (i + 1)))
                elif kind == "roll":
                    for i in range(count):
                        x = jnp.maximum(x, pltpu.roll(prev, i + 1, 1))
                elif kind == "reduce":
                    for i in range(count):
                        m = jnp.max(x + np.float32(0.001 * i), axis=1,
                                    keepdims=True)
                        x = jnp.maximum(x, m)
                elif kind == "window":
                    # one shift-doubling window max of width 29
                    for i in range(count):
                        m = x + np.float32(0.001 * i)
                        cover, w = 1, 29
                        while cover < w:
                            sft = min(cover, w - cover)
                            m = jnp.maximum(m, pltpu.roll(m, (P - sft) % P, 1))
                            cover += sft
                        x = jnp.maximum(x, m)
                if store:
                    rows.append(x)
                prev = jnp.maximum(x, obs_j)
            if store:
                t1m1_ref[:, pl.ds(j0, GROUP), :] = jnp.stack(rows, axis=1)
        carry[:, :] = prev
        if not store:
            t1m1_ref[:, 0:GROUP, :] = jnp.broadcast_to(
                prev[:, None, :], (N, GROUP, P))

    return kernel


@functools.lru_cache(maxsize=64)
def build(mix, store):
    n_chunks = T // BLOCK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((N, BLOCK, P), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((N, BLOCK, P), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((N, P), jnp.float32)],
    )
    call = pl.pallas_call(
        make_kernel(mix, store),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, T, P), jnp.float32)],
        interpret=False,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=(4 + 3 * mix[1]) * N * T * P,
            bytes_accessed=N * T * P * 8, transcendentals=0),
    )
    return jax.jit(lambda o: call(o)[0])


def timed(fn, obs, iters=5):
    _ = int(jnp.sum(fn(obs)[:, -1, :]))
    t0 = time.perf_counter()
    for _ in range(iters):
        _ = int(jnp.sum(fn(obs)[:, -1, :]))
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    obs = jax.random.uniform(key, (N, T, P), jnp.float32, -20.0, 0.0)
    obs = obs.block_until_ready()
    frames = N * T  # per-frame figures below are per [N, P] tensor-op set

    results = {}
    cases = [
        (("max", 0), True),
        (("max", 8), True),
        (("max", 16), True),
        (("roll", 4), True),
        (("roll", 8), True),
        (("reduce", 2), True),
        (("reduce", 4), True),
        (("window", 1), True),
        (("window", 2), True),
        (("max", 0), False),
        (("max", 8), False),
    ]
    for mix, store in cases:
        t = timed(build(mix, store), obs)
        results[(mix, store)] = t
        print(f"{mix[0]:>7} x{mix[1]:<2} store={int(store)}: "
              f"{t*1e3:8.2f} ms  ({t/T*1e9:7.1f} ns/frame)", flush=True)

    def ns(mix, store=True):
        return results[(mix, store)] / T * 1e9

    base = ns(("max", 0))
    print(f"\nper-frame overhead (load+store+carry): {base:.1f} ns")
    print(f"elementwise max:  {(ns(('max',16))-ns(('max',8)))/8:6.1f} ns/op")
    print(f"roll+max:         {(ns(('roll',8))-ns(('roll',4)))/4:6.1f} ns/op")
    print(f"lane reduce:      {(ns(('reduce',4))-ns(('reduce',2)))/2:6.1f} ns/op")
    print(f"window29 max:     {(ns(('window',2))-ns(('window',1))):6.1f} ns/op")
    print(f"row store:        {ns(('max',8))-ns(('max',8),False):6.1f} ns/frame")


if __name__ == "__main__":
    main()
