"""wav -> melody transcription CLI: the full serving chain on tiny audio.

Covers the NN-family path (front-end -> restored checkpoint -> decode)
and the checkpoint-free imm path (NMF fitted per recording).
"""

import numpy as np
import pytest
from scipy.io import wavfile


def _write_wav(path, sr, seconds, freq=440.0):
    t = np.arange(int(seconds * sr)) / sr
    # a few harmonics so CFP/NMF front-ends see real structure
    x = (
        0.5 * np.sin(2 * np.pi * freq * t)
        + 0.25 * np.sin(2 * np.pi * 2 * freq * t)
        + 0.125 * np.sin(2 * np.pi * 3 * freq * t)
    )
    wavfile.write(path, sr, (x * 32767 * 0.8).astype(np.int16))


def _artifacts(tmp_path, family, rng):
    from viterbi_spl_tpu.cli.hmm_artifacts import build_hmm_artifacts
    from viterbi_spl_tpu.families import family_spec

    spec = family_spec(family)
    track = np.clip(
        spec.n_bins // 2 + np.cumsum(rng.integers(-2, 3, 3000)),
        0, spec.n_bins - 1,
    )
    voiced = np.repeat(rng.random(151) > 0.3, 20)[:3000]
    track = np.where(voiced, track, spec.n_bins)
    build_hmm_artifacts([track], spec, tmp_path / "hmm")
    return tmp_path / "hmm"


def _make_ckpt(tmp_path, family, sample):
    """Init the family model on `sample` and save an untrained checkpoint
    (transcription only needs restore mechanics, not accuracy)."""
    import importlib

    import optax

    from viterbi_spl_tpu.apps.common import init_model
    from viterbi_spl_tpu.harness.train import Trainer, TrainState

    cfg = importlib.import_module(f"viterbi_spl_tpu.apps.{family}").config()
    model, params, batch_stats = init_model(cfg, sample)
    tx = optax.adam(cfg.learning_rate)
    state = TrainState(
        params=params, batch_stats=batch_stats, opt_state=tx.init(params),
        voicing_threshold=0.4,
    )
    trainer = Trainer(None, None, ckpt_path=str(tmp_path / "ckpt"))
    trainer.save(state)
    return tmp_path / "ckpt"


def test_transcribe_msnet_wav_to_melody(tmp_path, rng):
    from viterbi_spl_tpu.cli import transcribe as TR

    wav = tmp_path / "song.wav"
    _write_wav(wav, 44100, 0.8)
    art = _artifacts(tmp_path, "msnet", rng)

    # the checkpoint must be initialized on the same feature shape the
    # CLI will feed it: build it from the wav's own features
    from viterbi_spl_tpu.io.wav import load_wav

    samples, _ = load_wav(wav, sr=44100)
    feats = TR.features_from_samples("msnet", samples)
    assert feats.ndim == 3 and feats.shape[1:] == (320, 3)
    ckpt = _make_ckpt(tmp_path, "msnet", feats[: feats.shape[0]][None])

    out = TR.main(
        [str(wav), "--family", "msnet", "--ckpt", str(ckpt),
         "--artifacts", str(art), "--out", str(tmp_path / "mel")]
    )
    assert len(out) == 1
    lines = (tmp_path / "mel" / "song.txt").read_text().splitlines()
    assert len(lines) == feats.shape[0] == len(out[0]["times"])
    t0, f0 = map(float, lines[0].split("\t"))
    assert t0 == 0.0 and f0 >= 0.0
    # times advance on the family's hop grid
    t1 = float(lines[1].split("\t")[0])
    assert t1 == pytest.approx(out[0]["times"][1], abs=1e-6)

    # --threshold overrides the checkpoint's validated value
    out2 = TR.main(
        [str(wav), "--family", "msnet", "--ckpt", str(ckpt),
         "--artifacts", str(art), "--out", str(tmp_path / "mel2"),
         "--threshold", "0.9", "--format", "npz"]
    )
    d = np.load(tmp_path / "mel2" / "song.npz")
    assert set(d.files) >= {"voiced", "bins", "est_notes", "freqs", "times"}


def test_transcribe_missing_ckpt_exits(tmp_path, rng):
    from viterbi_spl_tpu.cli import transcribe as TR

    wav = tmp_path / "song.wav"
    _write_wav(wav, 8000, 0.3)
    with pytest.raises(SystemExit):
        TR.main([str(wav), "--family", "jdc", "--out", str(tmp_path / "o")])


def test_transcribe_imm_checkpoint_free(tmp_path, rng):
    """imm transcribes straight from audio: sinebell STFT -> NMF fit ->
    log-energy logits -> shaped Viterbi (imm/main_imm.py:1139-1180)."""
    from viterbi_spl_tpu.cli import transcribe as TR

    wav = tmp_path / "hum.wav"
    _write_wav(wav, 44100, 0.35, freq=330.0)
    out = TR.main(
        [str(wav), "--family", "imm", "--debug",
         "--out", str(tmp_path / "mel")]
    )
    assert len(out) == 1
    lines = (tmp_path / "mel" / "hum.txt").read_text().splitlines()
    assert len(lines) == len(out[0]["times"]) > 10
    freqs = np.array([float(l.split("\t")[1]) for l in lines])
    assert (freqs >= 0).all()


def test_imm_stereo_separation(tmp_path):
    """--separate: stereo wav -> melody/accompaniment resynthesis via the
    melody-constrained stereo NMF pass (imm/tf_imm.py:354-618). The melody
    estimate must carry most of the harmonic source's energy and the
    accompaniment most of the noise-band energy."""
    import wave

    import numpy as np

    from viterbi_spl_tpu.cli import transcribe
    from viterbi_spl_tpu.io.wav import load_wav

    sr = 44100
    n = int(0.6 * sr)
    t = np.arange(n) / sr
    rng = np.random.default_rng(0)
    voice = sum(
        (0.5 / k) * np.sin(2 * np.pi * 220.0 * k * t) for k in range(1, 5)
    )
    accomp = 0.15 * rng.normal(size=n)
    left = (0.8 * voice + 0.3 * accomp).astype(np.float32)
    right = (0.4 * voice + 0.8 * accomp).astype(np.float32)
    wav = tmp_path / "mix.wav"
    pcm = np.clip(np.stack([left, right], 1) * 32767, -32768, 32767)
    with wave.open(str(wav), "wb") as fh:
        fh.setnchannels(2)
        fh.setsampwidth(2)
        fh.setframerate(sr)
        fh.writeframes(pcm.astype(np.int16).tobytes())

    out = tmp_path / "sep"
    results = transcribe.main(
        [str(wav), "--family", "imm", "--separate", "--debug",
         "--out", str(out)]
    )
    assert len(results) == 1
    mel, msr = load_wav(out / "mix_melody.wav", mono=False)
    acc, _ = load_wav(out / "mix_accompaniment.wav", mono=False)
    assert msr == 44100 and mel.shape[1] == 2 and acc.shape == mel.shape
    assert np.isfinite(mel).all() and np.isfinite(acc).all()
    assert float(np.abs(mel).max()) > 1e-4  # non-silent resynthesis
    assert (out / "mix_melody.txt").exists()
    # reconstruction: melody + accompaniment ~ the mix per channel (the
    # Wiener masks of one channel sum to ~1 where the model explains it)
    mix = np.stack([left, right], 1)[: len(mel)]
    err = np.mean((mel + acc - mix) ** 2) / np.mean(mix**2)
    assert err < 0.5, err
