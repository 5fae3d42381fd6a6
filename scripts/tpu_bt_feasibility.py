"""Feasibility probe for backtrace v2 primitives on the real chip:

1. jnp.transpose of a [128, 384] f32 value inside a Pallas kernel
2. jnp.take_along_axis along a 128-lane axis (tpu.dynamic_gather)
3. the combination: per-track logB row gather in tracks-on-lanes layout
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/vspl_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, P = 128, 384


def t_kernel(x_ref, o_ref):
    o_ref[:, :] = jnp.transpose(x_ref[:, :])


def g_kernel(tab_ref, idx_ref, o_ref):
    # gather lanes: out[r, j] = tab[r, idx[r, j]], lane axis = 128 = 1 vreg
    o_ref[:, :] = jnp.take_along_axis(tab_ref[:, :], idx_ref[:, :], axis=1)


def rowgather_kernel(logBT_ref, s_ref, o_ref):
    # per-track logB row gather, tracks on lanes:
    # o[s', n] = logBT[s', s_n] via 3 single-vreg gathers + selects
    s_row = jnp.concatenate(
        [jnp.full((1, 1), s_ref[n], jnp.int32) for n in range(N)], axis=1
    )  # [1, N]
    idx = jnp.broadcast_to(s_row, (P, N))
    parts = []
    for c in range(3):
        chunk = logBT_ref[:, c * 128 : (c + 1) * 128]
        parts.append(jnp.take_along_axis(chunk, idx - c * 128, axis=1))
    G = jnp.where(idx < 128, parts[0], jnp.where(idx < 256, parts[1], parts[2]))
    o_ref[:, :] = G


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, P)), jnp.float32)

    out = pl.pallas_call(
        t_kernel,
        out_shape=jax.ShapeDtypeStruct((P, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert np.array_equal(np.asarray(out), np.asarray(x).T)
    print("transpose [128,384] in-kernel: OK")

    tab = jnp.asarray(rng.normal(size=(P, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, (P, 128)), jnp.int32)
    out = pl.pallas_call(
        g_kernel,
        out_shape=jax.ShapeDtypeStruct((P, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)
    assert np.array_equal(
        np.asarray(out), np.take_along_axis(np.asarray(tab), np.asarray(idx), 1)
    )
    print("take_along_axis lane gather: OK")

    logBT = jnp.asarray(rng.normal(size=(P, P)), jnp.float32)
    s = jnp.asarray(rng.integers(0, P, (N,)), jnp.int32)
    out = pl.pallas_call(
        rowgather_kernel,
        out_shape=jax.ShapeDtypeStruct((P, N), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(logBT, s)
    want = np.asarray(logBT)[:, np.asarray(s)]
    assert np.array_equal(np.asarray(out), want)
    print("per-track row gather (3-chunk): OK")


if __name__ == "__main__":
    main()
