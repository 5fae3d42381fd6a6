"""Multi-host scaling cost model (DESIGN.md §4c).

The BASELINE scaling target (≥85% efficiency at N≥2 hosts) cannot be
measured on this box (one chip). This script produces the CHECKABLE
PREDICTION a future multi-chip run is validated against:

1. MEASURED collective bytes per step/seam: the real programs — the
   sequence-parallel Viterbi decode (`dist/sharded_viterbi.py`) and the
   data-/tensor-parallel training steps (`apps/common.py::make_train_step`
   + `dist/tp.py`) — are compiled on the virtual 8-device CPU mesh and the
   optimized HLO is scanned for collective ops (collective-permute,
   all-reduce, all-gather, reduce-scatter), summing result bytes. The
   decode seam bytes are cross-checked against the analytic expression
   (2 halos × [H, P] f32 + the two certificate exchanges).
2. ANALYTIC halo overhead: each seq-parallel device computes H + L + H
   frames to keep L, so the recompute fraction is 2H/L.
3. PREDICTED efficiency over DCN: eff(L, H) = L·t_frame /
   ((L + 2H)·t_frame + bytes/bw + latency), with the single-track device
   frame time measured in BENCH and stated DCN parameters. The table
   reports the minimum block length L* where eff ≥ 0.85 for 2 hosts.

Run (CPU mesh):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/scaling_cost_model.py
Writes docs/scaling_cost_model.md and prints a JSON summary line.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vspl_jax_cache_cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import re  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1,
    "pred": 1, "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|s32|s16|s8|u64|u32|u16|u8|pred|c64|c128)\[([0-9,]*)\]")

COLLECTIVES = ("collective-permute", "all-reduce", "all-gather", "reduce-scatter")


def _shape_bytes(text: str) -> int:
    """Sum bytes of every typed shape in `text` (handles tuple results)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text: str) -> dict[str, dict[str, int]]:
    """Per collective-op type: op count and total RESULT bytes, from the
    optimized HLO text of a compiled program. `-start` variants are
    counted; their `-done` halves are skipped (same buffer)."""
    out: dict[str, dict[str, int]] = {
        k: {"count": 0, "result_bytes": 0} for k in COLLECTIVES
    }
    for line in hlo_text.splitlines():
        if "=" not in line:
            continue
        lhs, _, rhs = line.partition("=")
        for op in COLLECTIVES:
            # the opcode occurrence: `<result shapes> all-reduce(...)`.
            # Operand REFERENCES are %-prefixed (`%all-reduce.47`), and
            # `-done(` fails the `(-start)?\(` tail, so neither matches.
            m = re.search(rf"(?<![%.\w-]){op}(-start)?\(", rhs)
            if m:
                out[op]["count"] += 1
                out[op]["result_bytes"] += _shape_bytes(rhs[: m.start()])
                break
    return out


def measure_seq_decode(S=361, L=512, H=64, n_dev=8):
    """Compile the sequence-parallel scan decode on the virtual mesh and
    return measured collective bytes + the analytic per-seam expression."""
    from jax.sharding import Mesh

    from viterbi_spl_tpu.dist.sharded_viterbi import (
        viterbi_sharded_time_blocks,
    )
    from viterbi_spl_tpu.hmm.viterbi import prepare_log_params

    rng = np.random.default_rng(0)
    A = rng.random((S, S)).astype(np.float64) ** 2 + np.eye(S)
    A /= A.sum(1, keepdims=True)
    pi = rng.random(S)
    pi /= pi.sum()
    log_B, log_pi = prepare_log_params(A, pi)
    T = L * n_dev
    obs = jnp.asarray(rng.random((T, S)), jnp.float32)

    mesh = Mesh(np.asarray(jax.devices()[:n_dev]).reshape(1, n_dev),
                ("data", "seq"))
    lowered = viterbi_sharded_time_blocks.lower(
        jnp.asarray(log_B), jnp.asarray(log_pi), obs, mesh, halo=H
    )
    hlo = lowered.compile().as_text()
    meas = collective_bytes(hlo)
    # analytic: per device, 2 obs-halo receives [H, S] f32 + certificate
    # (halo states [H] s32 + bp row [S] s32). The optimized HLO is SPMD —
    # one program per device — so collective result shapes are already
    # PER-DEVICE bytes.
    analytic_per_dev = 2 * H * S * 4 + H * 4 + S * 4
    return dict(
        S=S, L=L, H=H, n_dev=n_dev,
        measured=meas,
        measured_permute_bytes_per_device=(
            meas["collective-permute"]["result_bytes"]
        ),
        analytic_permute_bytes_per_device=analytic_per_dev,
    )


def measure_training_steps(n_dev=8, snippet=48, batch=8):
    """Compile the REAL msnet train step under (a) data parallelism and
    (b) data×tensor parallelism on the virtual mesh; return collective
    bytes per optimizer step and the replicated parameter byte count."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from viterbi_spl_tpu.apps import msnet as msnet_app
    from viterbi_spl_tpu.apps.common import make_train_step
    from viterbi_spl_tpu.dist import make_mesh, make_tp_mesh
    from viterbi_spl_tpu.dist.tp import tp_shard_tree

    cfg = msnet_app.config()
    model = cfg.make_model()
    rng = np.random.default_rng(0)
    spec = jnp.asarray(
        rng.random((batch, snippet, *cfg.feature_shape)), jnp.float32
    )
    notes = jnp.asarray(
        rng.uniform(40, 80, (batch, snippet)), jnp.float32
    )
    variables = model.init(
        jax.random.PRNGKey(0), spec[:1], train=False
    )
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    step_fn = make_train_step(cfg, model, tx)
    params_bytes = sum(
        np.prod(np.shape(p)) * 4 for p in jax.tree.leaves(params)
    )

    results = {}
    for tag, mesh in (
        ("dp", make_mesh(data=n_dev, seq=1)),
        ("dp_tp", make_tp_mesh(n_dev // 2, 2)),
    ):
        if tag == "dp":
            p_s = jax.device_put(params, NamedSharding(mesh, P()))
            bs_s = jax.device_put(batch_stats, NamedSharding(mesh, P()))
            o_s = jax.device_put(opt_state, NamedSharding(mesh, P()))
        else:
            p_s = tp_shard_tree(params, mesh)
            bs_s = tp_shard_tree(batch_stats, mesh)
            o_s = tp_shard_tree(opt_state, mesh)
        data_sh = NamedSharding(mesh, P("data"))
        batch_s = (
            jax.device_put(spec, data_sh),
            jax.device_put(notes, data_sh),
        )
        hlo = step_fn.lower(
            p_s, bs_s, o_s, batch_s, jnp.int32(0), jnp.float32(0.5)
        ).compile().as_text()
        results[tag] = collective_bytes(hlo)
    return dict(
        params_bytes=int(params_bytes), n_dev=n_dev,
        snippet=snippet, batch=batch, **results,
    )


def efficiency_table(
    t_frame_us: float,
    H_values=(64, 128, 256, 512),
    L_values=(2048, 4096, 8192, 16384, 32768, 65536),
    S=384,
    dcn_gbps=12.5,
    dcn_latency_us=100.0,
    target=0.85,
):
    """Predicted 2-host seq-parallel efficiency and the minimum block
    length crossing `target`. Comm per seam (both halos + certificate)
    crosses DCN once per decode; compute is (L + 2H)·t_frame."""
    rows = []
    bw = dcn_gbps * 1e9  # bytes/s... (GB/s input)
    for H in H_values:
        seam_bytes = 2 * H * S * 4 + H * 4 + S * 4
        t_comm_us = seam_bytes / bw * 1e6 + dcn_latency_us
        effs = {}
        for L in L_values:
            eff = (L * t_frame_us) / ((L + 2 * H) * t_frame_us + t_comm_us)
            effs[L] = eff
        # solve eff >= target for L
        L_star = target * (2 * H * t_frame_us + t_comm_us) / (
            (1 - target) * t_frame_us
        )
        rows.append(dict(H=H, seam_bytes=seam_bytes,
                         t_comm_us=t_comm_us, eff=effs,
                         L_star=int(np.ceil(L_star))))
    return rows


def main(quick: bool = False):
    decode = measure_seq_decode()
    training = None if quick else measure_training_steps()

    # single-track banded decode frame time on v5e (BENCH r03 detail:
    # 104.6 ms for 128 tracks × 32768 frames; the N=16 batch runs ~4×
    # slower aggregate → single-track ≈ 16× the per-track batched time;
    # measured single-track full decode ≈ 1.1 µs/frame, CLAUDE.md)
    t_frame_us = 1.1
    eff = efficiency_table(t_frame_us)

    lines = []
    lines.append("# Multi-host scaling cost model (generated)\n")
    lines.append("Generated by `scripts/scaling_cost_model.py` on the "
                 "virtual 8-device CPU mesh. See DESIGN.md §4c.\n")
    lines.append("## Measured collective bytes (optimized HLO)\n")
    d = decode
    lines.append(
        f"- **Seq-parallel decode** (S={d['S']}, L={d['L']}, H={d['H']}, "
        f"{d['n_dev']} devices): collective-permute "
        f"{d['measured']['collective-permute']['count']} ops, "
        f"{d['measured_permute_bytes_per_device']:,} "
        f"bytes/device/decode (HLO shapes are SPMD per-device; analytic "
        f"{d['analytic_permute_bytes_per_device']:,}: two [H,S] f32 obs "
        f"halos + [H] s32 certificate states + [S] s32 bp row).\n"
    )
    if training:
        t = training
        lines.append(
            f"- **Training step** (msnet, batch={t['batch']}, "
            f"snippet={t['snippet']}, params {t['params_bytes']:,} B):\n"
        )
        for tag, label in (("dp", "data-parallel (data=8)"),
                           ("dp_tp", "data×tensor (data=4, model=2)")):
            m = t[tag]
            parts = ", ".join(
                f"{op} ×{m[op]['count']} = {m[op]['result_bytes']:,} B"
                for op in COLLECTIVES if m[op]["count"]
            ) or "none"
            lines.append(f"  - {label}: {parts}\n")
        lines.append(
            "  (dp's all-reduce result bytes ≈ the parameter bytes — the "
            "gradient sync; tp adds layer-seam all-gathers whose bytes "
            "scale with activations, not parameters.)\n"
        )
    lines.append("\n## Halo recompute + DCN efficiency prediction (2 hosts)\n")
    lines.append(
        f"Single-track banded decode frame time t = {t_frame_us} µs "
        f"(BENCH-derived), DCN 12.5 GB/s + 100 µs latency, seam crosses "
        f"DCN once per decode. eff(L, H) = L·t / ((L+2H)·t + t_comm).\n"
    )
    Ls = (2048, 4096, 8192, 16384, 32768, 65536)
    header = "| H | seam bytes | t_comm (µs) | " + " | ".join(
        f"L={L}" for L in Ls
    ) + " | L* (eff≥85%) |"
    lines.append(header)
    lines.append("|" + "---|" * (len(Ls) + 4))
    for row in eff:
        cells = " | ".join(f"{row['eff'][L]:.3f}" for L in Ls)
        lines.append(
            f"| {row['H']} | {row['seam_bytes']:,} | "
            f"{row['t_comm_us']:.0f} | {cells} | {row['L_star']:,} |"
        )
    lines.append(
        "\nReading: at the default H=64 the halo recompute fraction 2H/L "
        "and the DCN seam cost are both <1% for L ≥ 32k frames — a "
        "2-host split of any track longer than ~2·L* frames decodes at "
        "≥85% efficiency; the certified auto-halo doubling "
        "(dist/sharded_viterbi.py::viterbi_decode_time_sharded) can halve "
        "L* again when seams merge at H=64. The prediction to check on "
        "real hardware: measured eff within a few % of this table (the "
        "model has no overlap/queueing terms).\n"
    )

    out_path = os.path.join(
        os.path.dirname(__file__), "..", "docs", "scaling_cost_model.md"
    )
    with open(os.path.abspath(out_path), "w") as fh:
        fh.write("\n".join(lines))

    import json

    summary = dict(
        permute_bytes_per_device=d["measured_permute_bytes_per_device"],
        analytic_bytes_per_device=d["analytic_permute_bytes_per_device"],
        L_star_H64=eff[0]["L_star"],
    )
    if training:
        summary["dp_allreduce_bytes"] = training["dp"]["all-reduce"][
            "result_bytes"
        ]
        summary["params_bytes"] = training["params_bytes"]
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
