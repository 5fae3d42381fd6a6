"""Exhaustion study of the obs kernel's DMA floor (round-3 VERDICT #3).

Round 3 measured the [N, 32, P]-blocked COPY kernel at 7.8 ms for
N=128 x T=8192 x P=384 f32 (1.6 GB in + 1.6 GB out) against a
3.9 ms bound at the quoted 819 GB/s HBM peak — an unexplained 2x. This
script measures every structural lever on the real chip:

  - XLA's own single-pass elementwise op at the same shape (what the
    compiler's native pipeline achieves for 1R+1W),
  - Mosaic copy kernels across block_frames / grid arrangement /
    dimension_semantics ("arbitrary" vs "parallel"),
  - read-only and write-only kernels (split the two streams),
  - a direct HBM->HBM DMA (no VMEM round trip, single descriptor),
  - manual multi-slot HBM->HBM chunked DMA pipelines (descriptor
    depth/granularity),
  - manual HBM->VMEM->HBM double-buffered pipelines (the guide's
    pattern, decoupled from Mosaic's automatic one),

then re-times the production direct-log obs kernel at the best copy
configuration found. The outcome either produces a faster obs kernel
(<= 9.5 ms target) or a measured table proving the 2x is intrinsic to
the chip's achievable 1R+1W bandwidth at these shapes.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_obs_floor.py
"""

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vspl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from viterbi_spl_tpu.hmm.obs_pallas import pad_logits_reflect
    from viterbi_spl_tpu.hmm.viterbi_pallas import _VMEM_LIMIT

    assert jax.default_backend() == "tpu"

    N, T, n_bins, P, spw = 128, 1 << 13, 360, 384, 5
    GB = N * T * P * 4 / 1e9
    raw = jax.random.normal(jax.random.PRNGKey(2), (N, T, n_bins),
                            jnp.float32) - 2.0
    padded = jnp.asarray(pad_logits_reflect(raw, spw, P))
    flat = jnp.reshape(padded, (N * T, P))
    _ = float(jnp.sum(padded[:, -1])) + float(jnp.sum(flat[-1]))
    print(f"tensor: [{N}, {T}, {P}] f32 = {GB:.2f} GB per stream", flush=True)

    red = jax.jit(lambda y: jnp.sum(y[..., -1, :]))

    def timed(fn, *args, iters=8):
        _ = float(red(fn(*args)))
        t0 = time.perf_counter()
        sums = [red(fn(*args)) for _ in range(iters)]
        _ = float(sum(sums))
        return (time.perf_counter() - t0) / iters * 1e3

    results = {}

    def report(name, ms):
        results[name] = ms
        eff = 2 * GB / (ms / 1e3) if ms else 0.0
        print(f"{name:44s} {ms:8.2f} ms   ({eff:5.0f} GB/s 1R+1W)",
              flush=True)

    # ---- XLA native single-pass elementwise (1R + 1W) ----
    report("xla elementwise [N,T,P]", timed(jax.jit(lambda x: x * 1.0001),
                                            padded))
    report("xla elementwise flat [N*T,P]",
           timed(jax.jit(lambda x: x * 1.0001), flat))

    # ---- Mosaic copy kernels: block_frames sweep x dimension_semantics ----
    def copy_call(block, semantics, n_split=1):
        def kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...] * 1.0001

        Nb = N // n_split
        grid = (n_split, T // block) if n_split > 1 else (T // block,)
        if n_split > 1:
            index = lambda j, i: (j, i, 0)
        else:
            index = lambda i: (0, i, 0)
        call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((Nb, block, P), index,
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((Nb, block, P), index,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, T, P), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT,
                dimension_semantics=(semantics,) * len(grid),
            ),
        )
        return jax.jit(call)

    for block in (8, 16, 32, 64, 128):
        for sem in ("arbitrary", "parallel"):
            report(f"mosaic copy [N,{block},P] {sem}",
                   timed(copy_call(block, sem), padded))
    for n_split in (4, 16):
        report(f"mosaic copy [N/{n_split},32,P] 2-D grid parallel",
               timed(copy_call(32, "parallel", n_split), padded))

    # flat rows
    def copy_flat(rows):
        def kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...] * 1.0001

        call = pl.pallas_call(
            kernel,
            grid=((N * T) // rows,),
            in_specs=[pl.BlockSpec((rows, P), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, P), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N * T, P), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT,
                dimension_semantics=("parallel",),
            ),
        )
        return jax.jit(call)

    for rows in (1024, 4096):
        report(f"mosaic copy flat [{rows},P] parallel",
               timed(copy_flat(rows), flat))

    # ---- read-only / write-only (stream split) ----
    def read_only(block=32):
        def kernel(x_ref, o_ref):
            o_ref[...] = jnp.max(x_ref[...], axis=1)

        call = pl.pallas_call(
            kernel,
            grid=(T // block,),
            in_specs=[pl.BlockSpec((N, block, P), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((N, P), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, P), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT,
                dimension_semantics=("arbitrary",),
            ),
        )
        return jax.jit(call)

    red_small = jax.jit(jnp.sum)

    def timed_small(fn, *args, iters=8):
        _ = float(red_small(fn(*args)))
        t0 = time.perf_counter()
        sums = [red_small(fn(*args)) for _ in range(iters)]
        _ = float(sum(sums))
        return (time.perf_counter() - t0) / iters * 1e3

    ms = timed_small(read_only(), padded)
    results["read only"] = ms
    print(f"{'read only (block max out [N,P])':44s} {ms:8.2f} ms   "
          f"({GB / (ms / 1e3):5.0f} GB/s read)", flush=True)

    def write_only(block=32):
        def kernel(x_ref, o_ref):
            row = x_ref[...]  # [N, P] tiny
            o_ref[...] = jnp.broadcast_to(
                row[:, None, :] * 1.0001, o_ref.shape
            )

        call = pl.pallas_call(
            kernel,
            grid=(T // block,),
            in_specs=[pl.BlockSpec((N, P), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((N, block, P), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, T, P), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT,
                dimension_semantics=("arbitrary",),
            ),
        )
        small = jnp.ones((N, P), jnp.float32)
        return jax.jit(lambda: call(small))

    ms = timed(write_only())
    results["write only"] = ms
    print(f"{'write only (broadcast in)':44s} {ms:8.2f} ms   "
          f"({GB / (ms / 1e3):5.0f} GB/s write)", flush=True)

    # ---- direct HBM->HBM DMA (single descriptor, no VMEM) ----
    def hbm_copy():
        def kernel(x_hbm, o_hbm, sem):
            dma = pltpu.make_async_copy(x_hbm, o_hbm, sem)
            dma.start()
            dma.wait()

        call = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((N * T, P), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        )
        return jax.jit(call)

    report("hbm->hbm single DMA", timed(hbm_copy(), flat))

    # ---- manual chunked HBM->HBM DMA pipeline (depth x granularity) ----
    def hbm_chunked(chunk_rows, slots):
        n_chunks = (N * T) // chunk_rows

        def kernel(x_hbm, o_hbm, sems):
            def get(i):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(i * chunk_rows, chunk_rows)],
                    o_hbm.at[pl.ds(i * chunk_rows, chunk_rows)],
                    sems.at[i % slots],
                )

            for s in range(slots):
                get(s).start()

            def body(i, _):
                get(i).wait()

                @pl.when(i + slots < n_chunks)
                def _():
                    get(i + slots).start()

                return 0

            jax.lax.fori_loop(0, n_chunks, body, 0)

        call = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((N * T, P), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((slots,))],
        )
        return jax.jit(call)

    for chunk_rows in (4096, 16384, 65536):
        for slots in (2, 4, 8):
            report(f"hbm->hbm chunked rows={chunk_rows} slots={slots}",
                   timed(hbm_chunked(chunk_rows, slots), flat))

    # ---- manual HBM->VMEM->HBM double-buffered pipeline ----
    def via_vmem(chunk_rows, slots):
        n_chunks = (N * T) // chunk_rows

        def kernel(x_hbm, o_hbm, scratch, in_sems, out_sems):
            def get_in(i):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(i * chunk_rows, chunk_rows)],
                    scratch.at[i % slots],
                    in_sems.at[i % slots],
                )

            def get_out(i):
                return pltpu.make_async_copy(
                    scratch.at[i % slots],
                    o_hbm.at[pl.ds(i * chunk_rows, chunk_rows)],
                    out_sems.at[i % slots],
                )

            for s in range(slots):
                get_in(s).start()

            def body(i, _):
                get_in(i).wait()
                # write this chunk out; wait before reusing the slot for
                # the next read (inputs i+1..i+slots-1 stay in flight, so
                # overlap comes from the other slots)
                get_out(i).start()
                get_out(i).wait()

                @pl.when(i + slots < n_chunks)
                def _():
                    get_in(i + slots).start()

                return 0

            jax.lax.fori_loop(0, n_chunks, body, 0)

        call = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((N * T, P), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((slots, chunk_rows, P), jnp.float32),
                pltpu.SemaphoreType.DMA((slots,)),
                pltpu.SemaphoreType.DMA((slots,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
        )
        return jax.jit(call)

    for chunk_rows, slots_list in ((2048, (2, 4)), (4096, (2,))):
        for slots in slots_list:
            report(f"hbm->vmem->hbm rows={chunk_rows} slots={slots}",
                   timed(via_vmem(chunk_rows, slots), flat))

    print("\nbest copy config:",
          min(results, key=lambda k: results[k]), flush=True)
    import json

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
