"""Mixed-precision (bf16 compute) checks for the flax model families.

Policy under test (models/*.py `dtype` attribute): convs/denses/LSTMs run in
the compute dtype, while params, BatchNorm statistics, softmaxes, and the
returned logits stay float32. A bf16 model must therefore (a) share the
f32 model's param tree exactly, (b) return float32 logits close to the f32
model's, and (c) train with float32 params/grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viterbi_spl_tpu.models import DCNet, FTANet, JDC, MSNet, TONet
from viterbi_spl_tpu.models.provenance import MCDNN, MLDRnet


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)


# (name, constructor, input shape, rel-error tolerance). msnet's argmax
# max-pool/unpool is discontinuous in precision — a near-tie argmax that
# flips under bf16 reroutes whole values — so its tolerance is looser.
CASES = [
    ("dcnet", lambda dt: DCNet(dtype=dt), (1, 16, 500), 0.15),
    ("msnet", lambda dt: MSNet(dtype=dt), (1, 8, 320, 3), 0.35),
    ("ftanet", lambda dt: FTANet(dtype=dt), (1, 128, 320, 3), 0.15),
    ("jdc", lambda dt: JDC(dtype=dt), (1, 31, 513), 0.15),
    ("tonet", lambda dt: TONet(attn_dim=256, dtype=dt), (1, 3, 360, 128), 0.15),
    ("mcdnn", lambda dt: MCDNN(dtype=dt), (1, 3, 360, 8), 0.15),
    ("mldrnet", lambda dt: MLDRnet(dtype=dt), (1, 3, 360, 8), 0.15),
]


@pytest.mark.parametrize("name,make,shape,tol", CASES, ids=[c[0] for c in CASES])
def test_bf16_forward_matches_f32(name, make, shape, tol):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, shape, jnp.float32)
    f32_model = make(jnp.float32)
    bf16_model = make(jnp.bfloat16)

    variables = f32_model.init({"params": rng}, x, train=False)
    # param_dtype is f32 in both variants -> identical param trees
    v_b = bf16_model.init({"params": rng}, x, train=False)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 variables, v_b)

    out_f = f32_model.apply(variables, x, train=False)
    out_b = bf16_model.apply(variables, x, train=False)

    def check(a, b):
        assert b.dtype == jnp.float32  # logits come back f32
        assert np.all(np.isfinite(np.asarray(b)))
        assert _rel_err(a, b) < tol

    if isinstance(out_f, dict):
        for k in out_f:
            check(out_f[k], out_b[k])
    else:
        check(out_f, out_b)


def test_bf16_train_step_keeps_f32_params():
    import optax

    from viterbi_spl_tpu.models import softmax_smoothed_loss

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 320, 3), jnp.float32)
    notes = jnp.asarray(np.where(np.arange(8) % 3 == 0, 0.0, 60.0), jnp.float32)
    notes = jnp.broadcast_to(notes, (2, 8))
    model = MSNet(dtype=jnp.bfloat16)
    variables = model.init({"params": rng}, x, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(p):
        out, upd = model.apply(
            {"params": p, "batch_stats": batch_stats}, x, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        return softmax_smoothed_loss(notes, out), upd["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(grads):
        assert leaf.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(leaf)))
    # BatchNorm statistics stay f32 (they are computed outside the bf16 ops)
    for leaf in jax.tree.leaves(new_stats):
        assert leaf.dtype == jnp.float32
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    for leaf in jax.tree.leaves(params):
        assert leaf.dtype == jnp.float32
