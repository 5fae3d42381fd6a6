"""JDC app (reference jdc/kum_m2m3.py): 64 x 31-frame STFT chunks, 722-class
CE + voicing BCE. The app's validation uses the re-referenced pitch logits;
the separate voicing logit feeds the dual-path inference via
harness.evaluate's voicing_logits input."""

from __future__ import annotations

from ..families import family_spec
from ..models import JDC, jdc_loss
from .common import AppConfig, app_main


def _loss(notes, out):
    return jdc_loss(notes, out["pitch"], out["voicing"])


def config() -> AppConfig:
    return AppConfig(
        family=family_spec("jdc"),
        make_model=lambda **kw: JDC(**kw),
        loss_fn=_loss,
        logits_adapter=lambda out: out["pitch"][..., 1:] - out["pitch"][..., :1],
        snippet_len=31,
        batch_size=64,
        learning_rate=1e-4,
        feature_shape=(513,),
        fixed_chunks=True,
        # the reference's conv kernels carry l2(1e-5) regularizers that
        # enter the training loss (jdc/acoustic_module.py:35,39,64)
        l2_reg=(JDC.l2_param_paths(), 1e-5),
        # the combined voicing head drives the raw path's voicing decision
        # and the validation threshold grid (jdc/acoustic_module.py:74-81)
        voicing_adapter=lambda out: out["voicing"],
    )


def build_real_datasets(debug: bool = False):
    from ..data import TrackDataset, medleydb_splits
    from ..data.labels import medleydb_label, resample_notes_to_10ms
    from ..data.vocals import is_vocals_from_sections
    from ..frontend import jdc_spectrogram
    from ..io.wav import load_wav
    import os

    def spec_fn(tid):
        wav = os.path.join(os.environ["medleydb"], tid, tid + "_MIX.wav")
        samples, _ = load_wav(wav, sr=8000)
        return jdc_spectrogram(samples)

    def label_fn(tid):
        lb = medleydb_label(tid, is_vocals_from_sections(tid))
        lb["notes"] = resample_notes_to_10ms(lb["notes"])
        return lb

    splits = medleydb_splits()
    if debug:
        splits = {k: v[:2] for k, v in splits.items()}
    return {
        name: TrackDataset(tids, spec_fn, label_fn, max_length_diff=2)
        for name, tids in splits.items()
    }


def build_external_datasets(debug: bool = False):
    """adc04/mirex05/mir1k/rwc evaluation sets on the jdc STFT front-end
    with 10 ms label resampling (jdc/kum_m2m3.py dataset classes)."""
    from ..frontend import jdc_spectrogram
    from .common import build_external_eval_datasets

    return build_external_eval_datasets(
        jdc_spectrogram, sr=8000, labels_on_10ms=True, debug=debug
    )


def main(argv=None):
    return app_main(config(), build_real_datasets, argv,
                    build_external_datasets=build_external_datasets)


if __name__ == "__main__":
    main()
