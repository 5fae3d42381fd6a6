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
