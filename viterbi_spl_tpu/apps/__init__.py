"""Per-family applications — the TPU-native counterparts of the reference's
per-family experiment scripts (SURVEY.md §2.9: dcnet/main.py,
msnet/hsieh_m2m3.py, ftanet/yu.py, jdc/kum_m2m3.py, tonet/main_shaun.py,
imm/main_imm.py).

Each app wires Config -> data -> model -> Trainer/eval through the shared
harness. Run e.g.:

    python -m viterbi_spl_tpu.apps.msnet train --synthetic --debug
    python -m viterbi_spl_tpu.apps.msnet infer --ckpt ckpts/d0 --synthetic
    python -m viterbi_spl_tpu.apps.imm eval --synthetic

`--synthetic` builds a tiny synthetic-audio dataset (no dataset roots
needed) — the framework's equivalent of the reference's DEBUG-mode smoke
runs; without it the apps read the env-var dataset roots (medleydb,
melody2_dir, adc04, ...).
"""
