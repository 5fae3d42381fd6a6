"""Per-family app smoke runs: tiny synthetic train -> infer end-to-end.

The framework's analog of the reference's DEBUG-mode integration smoke
(SURVEY.md §4.5): each family app must train a few epochs on synthetic
data, checkpoint, and run the dual raw/Viterbi inference without error.
"""

import numpy as np
import pytest


def _run(app_module, tmp_path, extra_train=()):
    ckpt = str(tmp_path / "ckpt")
    state = app_module.main(
        ["train", "--synthetic", "--debug", "--ckpt", ckpt,
         "--epochs", "2", "--steps-per-epoch", "4", "--patience", "5",
         *extra_train]
    )
    assert state.best_oa > -1
    state2 = app_module.main(["infer", "--synthetic", "--debug", "--ckpt", ckpt])
    return state, state2


def test_msnet_app(tmp_path):
    from viterbi_spl_tpu.apps import msnet

    state, _ = _run(msnet, tmp_path)
    assert 0 <= state.voicing_threshold <= 1


def test_dcnet_app(tmp_path):
    from viterbi_spl_tpu.apps import dcnet

    _run(dcnet, tmp_path)


def test_ftanet_app(tmp_path):
    from viterbi_spl_tpu.apps import ftanet

    _run(ftanet, tmp_path)


def test_jdc_app(tmp_path):
    from viterbi_spl_tpu.apps import jdc

    _run(jdc, tmp_path)


@pytest.mark.slow
def test_tonet_app(tmp_path):
    from viterbi_spl_tpu.apps import tonet

    _run(tonet, tmp_path)


def test_imm_app():
    from viterbi_spl_tpu.apps import imm

    out = imm.main(["eval", "--synthetic", "--debug"])
    assert np.isfinite(out["viterbi_mean_oa"])


def test_tonet_lr_schedule():
    import numpy as np
    from viterbi_spl_tpu.apps.tonet import tonet_lr_schedule

    sched = tonet_lr_schedule(1e-4, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(5e-5)
    assert float(sched(49)) == pytest.approx(5e-5)  # epoch 4: still warm-up
    assert float(sched(50)) == pytest.approx(5e-5)  # epoch 5: 0.98^0
    assert float(sched(60)) == pytest.approx(5e-5 * 0.98)
    assert float(sched(150)) == pytest.approx(5e-5 * 0.98**10, rel=1e-5)


def test_imm_original_method(rng):
    """The third imm evaluation path: HF0 + analytic transition + energy
    voicing scored through the mir_eval-semantics metrics."""
    from viterbi_spl_tpu.apps.imm import evaluate_imm_original
    from viterbi_spl_tpu.models.imm import IMM, IMMConfig
    from viterbi_spl_tpu.metrics.mel_eval import hz_to_midi, midi_to_hz

    cfg = IMMConfig(w=512, h=64, niters=10, R=6, P=8, K=4, bins_per_note=4)
    imm = IMM(cfg)
    sr = cfg.fs
    t = np.arange(sr // 4) / sr
    y = sum((0.6 / k) * np.sin(2 * np.pi * 220.0 * k * t) for k in range(1, 5))
    y = (y + 0.02 * rng.normal(size=len(t))).astype(np.float32)
    SX = np.abs(np.asarray(imm.stft.stft(y))) ** 2
    fit = imm.fit(SX, seed=0)
    T = np.asarray(fit["HF0"]).shape[1]
    notes = np.full(T, float(hz_to_midi(np.array([220.0]))[0]), np.float32)
    freqs = midi_to_hz(notes)
    out = evaluate_imm_original(
        imm,
        [dict(SX=SX, fit=fit, notes=notes,
              original=dict(times=np.arange(T) * cfg.h / sr, freqs=freqs))],
    )
    assert np.isfinite(out["mean_oa"]) and 0.0 <= out["mean_oa"] <= 1.0


def test_app_dump_tracks(tmp_path):
    from viterbi_spl_tpu.apps import msnet

    ckpt = str(tmp_path / "ckpt")
    msnet.main(["train", "--synthetic", "--debug", "--ckpt", ckpt,
                "--epochs", "1", "--steps-per-epoch", "2", "--patience", "2"])
    dump = tmp_path / "analysis"
    msnet.main(["infer", "--synthetic", "--debug", "--ckpt", ckpt,
                "--dump-tracks", str(dump), "--log-dir", str(tmp_path / "log")])
    pngs = list(dump.glob("*.png"))
    npzs = list(dump.glob("*.npz"))
    assert pngs and npzs
    d = np.load(npzs[0])
    assert "viterbi_notes" in d and len(d["ref_notes"]) == len(d["raw_notes"])
    events = (tmp_path / "log" / "events.jsonl").read_text()
    assert "viterbi" in events


def test_app_calibration_modes(tmp_path):
    """The sweep/ablation experiment modes (reference's standalone scripts
    ftanet/threshold.py, tonet/hyper_parameter_selection.py,
    tonet/hard_thresholding_vs_automatic_thresholding.py) run end-to-end
    from the app CLI."""
    from viterbi_spl_tpu.apps import msnet

    ckpt = str(tmp_path / "ckpt")
    msnet.main(["train", "--synthetic", "--debug", "--ckpt", ckpt,
                "--epochs", "1", "--steps-per-epoch", "2", "--patience", "2"])
    sweep = msnet.main(["sweep-threshold", "--synthetic", "--debug",
                        "--ckpt", ckpt])
    assert 0 < sweep["best_threshold"] < 1
    assert len(sweep["thresholds"]) == len(sweep["oa"]) == 99
    hva = msnet.main(["hard-vs-auto", "--synthetic", "--debug", "--ckpt", ckpt,
                      "--hard-threshold", "0.5"])
    assert np.isfinite(hva["auto"]["viterbi_mean_oa"])
    assert np.isfinite(hva["hard"]["viterbi_mean_oa"])
    obs = msnet.main(["sweep-obs", "--synthetic", "--debug", "--ckpt", ckpt])
    assert obs["oa"].shape == (4, 3) and np.all(np.isfinite(obs["oa"]))


def test_imm_app_original_flag():
    """--original runs the third imm method from the CLI (eval prints all
    three OAs; imm/main_imm.py MetricsOriginal path)."""
    from viterbi_spl_tpu.apps import imm

    out = imm.main(["eval", "--synthetic", "--debug", "--original"])
    assert "original" in out
    assert np.isfinite(out["original"]["mean_oa"])


def test_app_native_prefetch_training(tmp_path):
    """Training through the C++ prefetch ring end-to-end (ftanet: 128-frame
    snippets fit the debug tracks; msnet's 1200-frame snippets trigger the
    graceful Python-pipeline fallback)."""
    from viterbi_spl_tpu.apps import ftanet, msnet

    state = ftanet.main(
        ["train", "--synthetic", "--debug", "--ckpt", str(tmp_path / "ck"),
         "--epochs", "1", "--steps-per-epoch", "3", "--patience", "2",
         "--native-prefetch"]
    )
    assert state.best_oa > -1

    state = msnet.main(
        ["train", "--synthetic", "--debug", "--ckpt", str(tmp_path / "ck2"),
         "--epochs", "1", "--steps-per-epoch", "2", "--patience", "2",
         "--native-prefetch"]
    )
    assert state.best_oa > -1


def test_mesh_flag_malformed_values_exit_cleanly(tmp_path):
    """--mesh parse errors must be a clean SystemExit with usage text, not
    a raw ValueError traceback."""
    import dataclasses

    import pytest

    from viterbi_spl_tpu.apps import msnet as msnet_app
    from viterbi_spl_tpu.apps.common import app_main

    cfg = dataclasses.replace(msnet_app.config(), batch_size=2)
    for bad in ("4", "data=abc", "data"):
        with pytest.raises(SystemExit):
            app_main(
                cfg, None,
                ["train", "--synthetic", "--debug",
                 "--ckpt", str(tmp_path / "ck"), "--mesh", bad],
            )


def test_mesh_data_parallel_training_matches_single_device(tmp_path):
    """--mesh data=4 must reproduce the single-device loss curve at the
    same global batch (GSPMD data parallelism changes only the sharding,
    not the computation; reduction-order ulp tolerance)."""
    import dataclasses
    import json

    from viterbi_spl_tpu.apps import msnet as msnet_app
    from viterbi_spl_tpu.apps.common import app_main

    losses = {}
    for tag, extra in (("single", []), ("mesh", ["--mesh", "data=4"])):
        # snippet_len divides the 400-frame debug tracks: no ragged
        # snippets, so both runs draw byte-identical batch streams
        cfg = dataclasses.replace(
            msnet_app.config(), batch_size=4, snippet_len=50
        )
        log_dir = tmp_path / f"log_{tag}"
        app_main(
            cfg, None,
            ["train", "--synthetic", "--debug", "--epochs", "2",
             "--steps-per-epoch", "3", "--patience", "3",
             "--ckpt", str(tmp_path / f"ck_{tag}"),
             "--log-dir", str(log_dir)] + extra,
        )
        events = [
            json.loads(line)
            for line in (log_dir / "events.jsonl").read_text().splitlines()
        ]
        losses[tag] = [
            e["value"] for e in events
            if e.get("kind") == "scalar" and e.get("tag") == "train_loss"
        ]

    assert len(losses["single"]) == 2
    np.testing.assert_allclose(
        losses["mesh"], losses["single"], rtol=1e-4
    )


def test_mesh_tensor_parallel_training_matches_single_device(tmp_path):
    """--mesh data=2,model=2 (tensor parallelism, dist/tp.py) must also
    reproduce the single-device loss curve: sharding parameter channel
    dims over the model axis changes only the layout, GSPMD inserts the
    collectives."""
    import dataclasses
    import json

    from viterbi_spl_tpu.apps import msnet as msnet_app
    from viterbi_spl_tpu.apps.common import app_main

    losses = {}
    for tag, extra in (("single", []), ("tp", ["--mesh", "data=2,model=2"])):
        cfg = dataclasses.replace(
            msnet_app.config(), batch_size=4, snippet_len=50
        )
        log_dir = tmp_path / f"log_{tag}"
        app_main(
            cfg, None,
            ["train", "--synthetic", "--debug", "--epochs", "2",
             "--steps-per-epoch", "3", "--patience", "3",
             "--ckpt", str(tmp_path / f"ck_{tag}"),
             "--log-dir", str(log_dir)] + extra,
        )
        events = [
            json.loads(line)
            for line in (log_dir / "events.jsonl").read_text().splitlines()
        ]
        losses[tag] = [
            e["value"] for e in events
            if e.get("kind") == "scalar" and e.get("tag") == "train_loss"
        ]

    assert len(losses["single"]) == 2
    # looser than the data-parallel bound: tp also reorders WITHIN-layer
    # reductions, and adam turns ulp-level gradient differences on
    # near-zero gradients into ±lr parameter steps that compound across
    # steps (measured drift ~1e-4 rel after 2 epochs; real sharding
    # errors diverge at parameter scale)
    np.testing.assert_allclose(losses["tp"], losses["single"], rtol=1e-3)


def test_per_epoch_train_metrics_and_tables(tmp_path):
    """The reference computes the full VRR..OA set on training batches
    every epoch and writes TB metric tables (dcnet/softmax_viterbi.py:
    1599-1850, :3232-3355): events.jsonl from a synthetic run must carry
    per-epoch train metrics (plausible, improving) and train/validation
    markdown tables."""
    import json

    from viterbi_spl_tpu.apps import msnet

    log = tmp_path / "log"
    msnet.main(
        ["train", "--synthetic", "--debug", "--ckpt", str(tmp_path / "ck"),
         "--epochs", "4", "--steps-per-epoch", "8", "--patience", "10",
         "--log-dir", str(log)]
    )
    with open(log / "events.jsonl") as fh:
        events = [json.loads(line) for line in fh]

    oas = [e["value"] for e in events if e.get("tag") == "train_oa"]
    assert len(oas) == 4  # one per epoch
    assert all(0.0 <= v <= 1.0 for v in oas)
    # the synthetic task is learnable: training OA must not degrade
    assert max(oas[1:]) >= oas[0]
    for tag in ("train_vrr", "train_vfa", "train_va", "train_rpa_strict"):
        vals = [e["value"] for e in events if e.get("tag") == tag]
        assert len(vals) == 4 and all(0.0 <= v <= 1.0 for v in vals)

    ttables = [e for e in events
               if e.get("kind") == "text" and e.get("tag") == "train"]
    vtables = [e for e in events
               if e.get("kind") == "text" and e.get("tag") == "validation"]
    assert len(ttables) == 4 and len(vtables) == 4
    assert "| training |" in ttables[0]["text"]
    assert "| vrr |" in ttables[0]["text"]
    assert "**average**" in vtables[0]["text"]
