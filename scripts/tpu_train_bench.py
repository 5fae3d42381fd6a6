"""On-chip training-step throughput: f32 vs bf16 mixed precision.

Times the jitted train step (forward + backward + Adam update, BatchNorm/
dropout active) for every NN family at reference-like batch shapes
(SURVEY.md 2.7: dcnet/msnet train whole snippets at batch 1, ftanet 16x128
chunks, jdc 64x31 chunks, tonet 128-frame segments), in both compute
dtypes of the mixed-precision policy (models/*.py `dtype`).

Timing uses a scalar readback per step (the axon async host returns early
from block_until_ready). Prints one JSON line per (family, dtype) plus a
speedup summary.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_train_bench.py
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vspl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from viterbi_spl_tpu.models import (
        DCNet, FTANet, JDC, MSNet, TONet,
        dcnet_loss, jdc_loss, softmax_smoothed_loss, tonet_loss,
    )

    rng = np.random.default_rng(0)

    def notes_fn(B, T, lo, hi):
        return jnp.asarray(
            np.where(rng.random((B, T)) < 0.3, 0.0, rng.uniform(lo, hi, (B, T))),
            jnp.float32,
        )

    results = {}

    def run(name, make_model, x, notes, loss_fn, frames, iters=10):
        for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            model = make_model(dt)
            variables = model.init(jax.random.PRNGKey(0), x, train=False)
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
            tx = optax.adam(1e-4)
            opt_state = tx.init(params)

            @jax.jit
            def step(params, batch_stats, opt_state, x, notes):
                def loss(p):
                    out, upd = model.apply(
                        {"params": p, "batch_stats": batch_stats}, x, train=True,
                        rngs={"dropout": jax.random.PRNGKey(1)},
                        mutable=["batch_stats"],
                    )
                    return loss_fn(notes, out), upd["batch_stats"]

                (l, bs), grads = jax.value_and_grad(loss, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), bs, opt_state, l

            # compile + 2 warmup steps (scalar readback forces completion)
            params, batch_stats, opt_state, l = step(
                params, batch_stats, opt_state, x, notes
            )
            assert np.isfinite(float(l)), f"{name}/{dt_name} loss not finite"
            params, batch_stats, opt_state, l = step(
                params, batch_stats, opt_state, x, notes
            )
            float(l)

            t0 = time.perf_counter()
            for _ in range(iters):
                params, batch_stats, opt_state, l = step(
                    params, batch_stats, opt_state, x, notes
                )
                float(l)
            dt_s = (time.perf_counter() - t0) / iters
            results[(name, dt_name)] = dt_s
            print(json.dumps({
                "family": name, "dtype": dt_name,
                "step_ms": round(dt_s * 1e3, 2),
                "frames_per_s": round(frames / dt_s, 1),
                "final_loss": round(float(l), 4),
            }), flush=True)

    run("dcnet", lambda dt: DCNet(dtype=dt),
        jnp.asarray(rng.normal(size=(1, 1024, 500)), jnp.float32),
        notes_fn(1, 1024, 30, 80), dcnet_loss, 1024)
    run("msnet", lambda dt: MSNet(dtype=dt),
        jnp.asarray(rng.normal(size=(1, 1024, 320, 3)), jnp.float32),
        notes_fn(1, 1024, 30, 80), softmax_smoothed_loss, 1024)
    run("ftanet", lambda dt: FTANet(dtype=dt),
        jnp.asarray(rng.normal(size=(16, 128, 320, 3)), jnp.float32),
        notes_fn(16, 128, 30, 80), softmax_smoothed_loss, 16 * 128)
    run("jdc", lambda dt: JDC(dtype=dt),
        jnp.asarray(rng.normal(size=(64, 31, 513)), jnp.float32),
        notes_fn(64, 31, 40, 80),
        lambda n, out: jdc_loss(n, out["pitch"], out["voicing"]), 64 * 31)
    run("tonet", lambda dt: TONet(dtype=dt),
        jnp.asarray(rng.normal(size=(8, 3, 360, 128)), jnp.float32),
        notes_fn(8, 128, 32, 80), tonet_loss, 8 * 128)

    print("\nspeedups (f32 step time / bf16 step time):")
    for fam in ("dcnet", "msnet", "ftanet", "jdc", "tonet"):
        s = results[(fam, "f32")] / results[(fam, "bf16")]
        print(f"  {fam}: {s:.2f}x")


if __name__ == "__main__":
    main()
