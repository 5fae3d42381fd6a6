"""Small-scale regeneration of the reproduction drill (round-3 VERDICT #1,
round-5 hard regime).

Runs scripts/repro_drill.py --small for msnet only: the learnable fake
corpus, convergence training through the product app path, threshold
sweep, and the all-methods/all-corpora evaluation — then asserts the
scientific loop actually closed: OA materially above the always-unvoiced
chance floor on EVERY corpus, the auto-selected threshold agreeing with
the sweep, and the BASELINE-format artifact written.

The hard-regime test regenerates the degraded corpus (accompaniment +
tremolo + noise, data/fake_corpus.py hard=True) and asserts the drill
closes there too — the full-scale headline (positive Viterbi delta) is
asserted on the committed REPRO_r05 artifact, not at --small scale.
"""

import importlib.util
import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _load_drill():
    path = Path(__file__).parent.parent / "scripts" / "repro_drill.py"
    spec = importlib.util.spec_from_file_location("repro_drill", path)
    drill = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(drill)
    return drill


def test_repro_drill_small(tmp_path):
    drill = _load_drill()
    out_base = tmp_path / "REPRO_test"
    results = drill.main([
        "--small", "--families", "msnet",
        "--workdir", str(tmp_path / "work"),
        "--out", str(out_base),
    ])

    r = results["regimes"]["clean"]["families"]["msnet"]
    # convergence: trained to a real validation OA, improving over epochs
    assert r["best_val_oa"] > 0.5, r["best_val_oa"]
    assert r["epochs_run"] >= 3
    assert r["val_oa_curve"][-1] > r["val_oa_curve"][0] or \
        max(r["val_oa_curve"]) > 0.5

    # threshold calibration: the reported threshold is the CHECKPOINTED
    # best-epoch one (apps/common.py restores after fit), so rerunning the
    # sweep on the restored checkpoint must reproduce it exactly — same
    # grid, same split, same params
    assert abs(r["selected_threshold"] - r["sweep_best_threshold"]) < 1e-6

    # the production (shaun) method clears chance MATERIALLY on every
    # corpus, raw and viterbi
    shaun = r["results"]["shaun"]
    for corpus, row in shaun.items():
        floor = r["chance_oa"][corpus]
        assert row["raw_oa"] > floor + 0.25, (corpus, row, floor)
        assert row["viterbi_oa"] > floor + 0.25, (corpus, row, floor)
        # mdb/adc04 sit on the family's own est grid: cross-check is tight
        if corpus in ("validation", "test", "adc04"):
            assert row["cross_check_max_abs"] < 1e-6, (corpus, row)

    # artifact written in BASELINE format
    md = (out_base.parent / (out_base.name + ".md")).read_text()
    assert "| corpus | chance | raw OA |" in md
    data = json.loads((out_base.parent / (out_base.name + ".json")).read_text())
    assert "msnet" in data["regimes"]["clean"]["families"]


def test_repro_drill_small_hard_regime(tmp_path):
    drill = _load_drill()
    out_base = tmp_path / "REPRO_test_hard"
    results = drill.main([
        "--small", "--regime", "hard", "--families", "msnet",
        "--workdir", str(tmp_path / "work"),
        "--out", str(out_base),
    ])

    r = results["regimes"]["hard"]["families"]["msnet"]
    # the degraded corpus is still learnable: validation OA materially
    # above the always-unvoiced chance floor (NOT saturated — that is the
    # point of the regime; the positive-viterbi-delta headline is a
    # full-scale property asserted on the committed artifact)
    floor = r["chance_oa"]["validation"]
    # hard-v2 gains are calibrated for the FULL budget (raw OA ~0.85
    # there); at --small scale learning is slower, so the assertion is
    # only "materially above chance", not the full-scale band
    assert r["best_val_oa"] > floor + 0.10, (r["best_val_oa"], floor)
    assert r["epochs_run"] >= 3

    # both regimes can live in one artifact: merge against a clean stub
    data = json.loads((out_base.parent / (out_base.name + ".json")).read_text())
    assert "msnet" in data["regimes"]["hard"]["families"]
    md = (out_base.parent / (out_base.name + ".md")).read_text()
    assert "Regime: hard" in md
