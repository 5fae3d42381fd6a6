"""On-chip training-step smoke: compile + run one optimizer step for every
model family on real TPU hardware (bf16-matmul path, BN/dropout/LSTM
lowering). The CI suite runs these on CPU only.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_train_smoke.py
"""

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

    def run(name, model, x, notes, loss_fn):
        t0 = time.time()
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

        params, batch_stats, opt_state, l0 = step(params, batch_stats, opt_state, x, notes)
        _, _, _, l1 = step(params, batch_stats, opt_state, x, notes)
        ok = np.isfinite(float(l0)) and np.isfinite(float(l1))
        print(f"{name}: loss {float(l0):.4f} -> {float(l1):.4f} "
              f"{'OK' if ok else 'NONFINITE'} ({time.time()-t0:.1f}s)", flush=True)

    notes_fn = lambda B, T, lo, hi: jnp.asarray(
        np.where(rng.random((B, T)) < 0.3, 0.0, rng.uniform(lo, hi, (B, T))), jnp.float32
    )

    run("dcnet", DCNet(), jnp.asarray(rng.normal(size=(1, 128, 500)), jnp.float32),
        notes_fn(1, 128, 30, 80), dcnet_loss)
    run("msnet", MSNet(), jnp.asarray(rng.normal(size=(1, 128, 320, 3)), jnp.float32),
        notes_fn(1, 128, 30, 80), softmax_smoothed_loss)
    run("ftanet", FTANet(), jnp.asarray(rng.normal(size=(2, 128, 320, 3)), jnp.float32),
        notes_fn(2, 128, 30, 80), softmax_smoothed_loss)
    run("jdc", JDC(), jnp.asarray(rng.normal(size=(4, 31, 513)), jnp.float32),
        notes_fn(4, 31, 40, 80),
        lambda n, out: jdc_loss(n, out["pitch"], out["voicing"]))
    run("tonet", TONet(), jnp.asarray(rng.normal(size=(1, 3, 360, 128)), jnp.float32),
        notes_fn(1, 128, 32, 80), tonet_loss)
    print("done")


if __name__ == "__main__":
    main()
