"""bf16-vs-f32 convergence on the real TPU (round-5 VERDICT #5).

Trains msnet through the product app path on the learnable synthetic
corpus twice — compute dtype float32 and bfloat16 (--bf16: convs/matmuls
in bf16, params/BN/softmax-CE in f32) — with identical budgets, and
reports both val-OA curves plus the final-epoch agreement. The f32 TPU
run is also the curve compared against the committed CPU run
(REPRO_r04/r05 msnet rows) for the platform-certification claim.

Run: PYTHONPATH=/root/.axon_site:/root/repo \
     python scripts/tpu_bf16_convergence.py --workdir /tmp/vspl_r05

Reference anchor for the training loop being certified:
dcnet/softmax_viterbi.py:3558-3597 (epoch loop + checkpoint-on-best).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vspl_jax_cache")


def curve(log_dir: Path, tag="val_oa"):
    evs = [json.loads(l) for l in (log_dir / "events.jsonl").read_text().splitlines()]
    return [round(e["value"], 4) for e in evs
            if e.get("kind") == "scalar" and e.get("tag") == tag]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/vspl_r05")
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--patience", type=int, default=6)
    ap.add_argument("--steps-per-epoch", type=int, default=24)
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent
                                         / "docs" / "tpu_bf16_convergence.json"))
    args = ap.parse_args()

    workdir = Path(args.workdir)
    env = json.loads((workdir / "corpus" / "env.json").read_text())
    os.environ.update(env)

    from viterbi_spl_tpu.apps import msnet

    results = {}
    for label, extra in (("f32", []), ("bf16", ["--bf16"])):
        ckpt = workdir / f"bf16cmp_ckpt_{label}"
        log = workdir / f"bf16cmp_log_{label}"
        t0 = time.time()
        state = msnet.main(
            ["train", "--debug", "--ckpt", str(ckpt),
             "--epochs", str(args.epochs),
             "--steps-per-epoch", str(args.steps_per_epoch),
             "--patience", str(args.patience),
             "--log-dir", str(log)] + extra
        )
        results[label] = dict(
            best_val_oa=float(state.best_oa),
            best_epoch=int(state.best_epoch),
            selected_threshold=float(state.voicing_threshold),
            val_oa_curve=curve(log),
            threshold_curve=curve(log, "voicing_threshold"),
            train_seconds=round(time.time() - t0, 1),
        )
        print(label, results[label]["val_oa_curve"],
              f"{results[label]['train_seconds']}s", flush=True)

    f32, bf16 = results["f32"], results["bf16"]
    n = min(len(f32["val_oa_curve"]), len(bf16["val_oa_curve"]))
    diffs = [abs(a - b) for a, b in zip(f32["val_oa_curve"][:n],
                                        bf16["val_oa_curve"][:n])]
    results["summary"] = dict(
        platform="tpu",
        best_oa_abs_diff=round(abs(f32["best_val_oa"] - bf16["best_val_oa"]), 4),
        max_curve_abs_diff=round(max(diffs), 4),
        final_curve_abs_diff=round(diffs[-1], 4),
    )
    Path(args.out).write_text(json.dumps(results, indent=1))
    print(json.dumps(results["summary"]))


if __name__ == "__main__":
    main()
