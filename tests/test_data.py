"""Data layer tests with synthetic annotation fixtures."""

import numpy as np
import pytest

from viterbi_spl_tpu.data import (
    Track,
    TrackDataset,
    adc04_track_ids,
    chunk_fixed,
    gen_split_list,
    inference_snippets,
    medleydb_splits,
    mirex05_track_ids,
    rwc_track_ids,
    training_snippets,
)
from viterbi_spl_tpu.data.labels import (
    HOP_256,
    adc04_label,
    medleydb_label,
    mir1k_label,
    mirex05_label,
    resample_notes_to_10ms,
    validity_check_of_ref_freqs,
)
from viterbi_spl_tpu.data.registry import reconcile_lengths
from viterbi_spl_tpu.data.vocals import is_vocals_from_m2m3, is_vocals_from_sections
from viterbi_spl_tpu.metrics.mel_eval import midi_to_hz


def test_splits():
    s = medleydb_splits()
    assert len(s["training"]) == 35
    assert len(s["validation"]) == 13
    assert len(s["test"]) == 12
    assert len(set(s["training"]) & set(s["test"])) == 0
    assert len(adc04_track_ids()) == 12
    assert len(mirex05_track_ids()) == 9
    assert len(rwc_track_ids()) == 100


def test_validity_check():
    validity_check_of_ref_freqs(np.array([0.0, 100.0, 440.0]))
    with pytest.raises(ValueError):
        validity_check_of_ref_freqs(np.array([5.0]))


def test_adc04_label(tmp_path):
    n = 50
    times = np.arange(n) * HOP_256
    freqs = np.where(np.arange(n) % 4 == 0, 0.0, 220.0)
    np.savetxt(tmp_path / "daisy1REF.txt", np.stack([times, freqs], 1))
    lb = adc04_label("daisy1", root=str(tmp_path))
    assert len(lb["notes"]) == n
    assert lb["notes"][0] == 0.0
    assert lb["notes"][1] == pytest.approx(57.0, abs=0.01)  # midi(220) = 57


def test_mirex05_label_resamples_to_256hop(tmp_path):
    n = 100
    times = np.arange(n) * 0.01
    freqs = np.full(n, 330.0)
    freqs[:10] = 0.0
    np.savetxt(tmp_path / "train01REF.txt", np.stack([times, freqs], 1))
    lb = mirex05_label("train01", root=str(tmp_path))
    n_256 = ((n - 1) * 441 + 255) // 256 + 1
    assert len(lb["notes"]) == n_256
    voiced = lb["notes"][lb["notes"] > 0]
    assert np.allclose(voiced, 12 * np.log2(330 / 440) + 69, atol=0.01)
    # original stays on the 10 ms grid
    assert len(lb["original"]["times"]) == n


def test_mir1k_label(tmp_path):
    (tmp_path / "PitchLabel").mkdir()
    n_frames = 40
    num_samples = (n_frames - 1) * 320 + 640
    pitches = np.where(np.arange(n_frames) % 3 == 0, 0.0, 60.0)
    np.savetxt(tmp_path / "PitchLabel" / "abjones_1.pv", pitches)
    lb = mir1k_label("abjones_1", num_samples, root=str(tmp_path))
    assert lb["notes"].dtype == np.float32
    v = lb["notes"][lb["notes"] > 0]
    assert np.allclose(v, 60.0, atol=1e-5)
    # freqs are Hz with the prepended 0 frame
    assert lb["original"]["freqs"][0] == 0.0


def test_medleydb_label(tmp_path):
    n = 30
    times = np.arange(n) * HOP_256
    freqs = np.full(n, 440.0)
    arr = np.stack([times, freqs], 1)
    np.savetxt(tmp_path / "Song_MELODY2.csv", arr, delimiter=",")
    mask = np.zeros(n, bool)
    mask[10:20] = True
    lb = medleydb_label("Song", mask, melody2_dir=str(tmp_path))
    assert np.all(lb["notes"][10:20] == 69.0)
    assert np.all(lb["notes"][:10] == 0.0)


def test_is_vocals_from_sections(tmp_path):
    n = 100
    times = np.arange(n) * HOP_256
    freqs = np.full(n, 220.0)
    freqs[:5] = 0.0
    np.savetxt(tmp_path / "Song_MELODY2.csv", np.stack([times, freqs], 1), delimiter=",")
    t0, t1 = 10 * HOP_256, 50 * HOP_256
    with open(tmp_path / "Song_SOURCEID.lab", "w") as fh:
        fh.write("start_time,end_time,instrument\n")
        fh.write(f"{t0},{t1},female singer\n")
        fh.write(f"{60*HOP_256},{70*HOP_256},electric guitar\n")
    mask = is_vocals_from_sections(
        "Song", section_dir=str(tmp_path), melody2_dir=str(tmp_path)
    )
    assert mask[20] and not mask[80]
    assert not mask[0]  # unvoiced melody2 -> False even inside a section


def test_is_vocals_from_m2m3():
    n = 10
    times = np.arange(n) * HOP_256
    m2 = np.stack([times, np.full(n, 100.0)], 1)
    m2[0, 1] = 0.0
    m3 = np.zeros((n, 3))
    m3[:, 0] = times
    m3[:, 1] = 100.0  # rank-1 column matches melody2
    m3[:, 2] = 150.0
    mask = is_vocals_from_m2m3(
        m2, m3,
        melody_rankings={0: 1, 3: 2},
        stem_instruments={0: "male singer", 3: "clean electric guitar"},
        is_instrumental=False,
    )
    assert not mask[0] and np.all(mask[1:])


def test_reconcile_lengths():
    spec = np.zeros((10, 4), np.float32)
    notes = np.zeros(11, np.float32)
    s2, n2 = reconcile_lengths(spec, notes)
    assert len(s2) == 11
    with pytest.raises(ValueError):
        reconcile_lengths(np.zeros((10, 4)), np.zeros(13))


def test_reconcile_pad_short_notes_bounds():
    """pad_short_notes zero-pads legitimate analysis-tail undershoots (the
    mir1k .pv rule, dcnet/softmax_viterbi.py:1262-1268) but refuses
    plainly-corrupt annotations covering a fraction of the track."""
    spec = np.zeros((400, 4), np.float32)
    # a ~7-frame tail undershoot pads cleanly
    s2, n2 = reconcile_lengths(spec, np.ones(393, np.float32),
                               pad_short_notes=True)
    assert len(n2) == 400 and n2[-1] == 0.0 and n2[392] == 1.0
    # half-length labels are an annotation/audio mismatch
    with pytest.raises(ValueError):
        reconcile_lengths(spec, np.ones(200, np.float32),
                          pad_short_notes=True)
    # without the flag, undershoot still raises
    with pytest.raises(ValueError):
        reconcile_lengths(spec, np.ones(393, np.float32))


def _toy_dataset():
    def spec_fn(tid):
        return np.full((37 if tid == "a" else 23, 4), ord(tid[0]), np.float32)

    def label_fn(tid):
        n = 37 if tid == "a" else 23
        return dict(
            notes=np.linspace(40, 50, n).astype(np.float32),
            original=dict(times=np.arange(n) * 0.01, freqs=np.full(n, 220.0)),
        )

    return TrackDataset(["a", "b"], spec_fn, label_fn)


def test_track_dataset_and_snippets():
    ds = _toy_dataset()
    assert len(ds) == 2
    assert ds.num_frames_vector.tolist() == [37, 23]
    assert ds[0].spectrogram.flags["WRITEABLE"] is False

    assert gen_split_list(37, 16) == [(0, 16), (16, 32), (32, 37)]

    items = list(inference_snippets(ds, 16))
    assert len(items) == 3 + 2
    assert items[0]["rec_idx"] == 0 and items[0]["snippet_idx"] == 0
    assert items[3]["rec_idx"] == 1
    # reassembly covers every frame exactly once
    total = sum(len(i["notes"]) for i in items)
    assert total == 37 + 23

    rng = np.random.default_rng(0)
    train_iter = training_snippets(ds, 16, rng)
    seen = [next(train_iter)["spectrogram"].shape[0] for _ in range(10)]
    assert max(seen) == 16


def test_chunk_fixed_roundtrip():
    spec = np.arange(70, dtype=np.float32).reshape(35, 2)
    notes = np.arange(35, dtype=np.float32)
    chunks, note_chunks, T = chunk_fixed(spec, notes, 16)
    assert chunks.shape == (3, 16, 2)
    rec = chunks.reshape(-1, 2)[:T]
    np.testing.assert_array_equal(rec, spec)


def test_resample_notes_to_10ms():
    notes = np.full(100, 60.0, np.float32)
    notes[:10] = 0.0
    out = resample_notes_to_10ms(notes)
    assert np.all((out == 0) | (np.abs(out - 60) < 1e-4))
    expected_len = int(np.floor(99 * HOP_256 / 0.01)) + 1
    assert len(out) == expected_len


def test_rwc_melody_and_label(tmp_path):
    from viterbi_spl_tpu.data.labels import rwc_label, rwc_melody_freqs

    mel_dir = tmp_path / "popular" / "AIST.RWC-MDB-P-2001.MELODY"
    mel_dir.mkdir(parents=True)
    with open(mel_dir / "RM-P001.MELODY.TXT", "w") as fh:
        for i in range(10, 50):
            fh.write(f"{i} {i} m 220.0 0\n")
    freqs = rwc_melody_freqs(0, 60, root=str(tmp_path))
    assert freqs[5] == 0.0 and freqs[20] == 220.0
    lb = rwc_label(0, 60, root=str(tmp_path))
    v = lb["notes"][lb["notes"] > 0]
    assert np.allclose(v, 12 * np.log2(220 / 440) + 69, atol=0.01)


def test_rwc_rec_files(tmp_path):
    from viterbi_spl_tpu.data.labels import rwc_rec_files

    # two disks: 60 + 40 recordings
    counts = [60, 40, 0, 0, 0, 0, 0]
    for disk, cnt in enumerate(counts, start=1):
        d = tmp_path / "popular" / f"RWC-MDB-P-2001-M0{disk}"
        d.mkdir(parents=True)
        for i in range(1, cnt + 1):
            (d / f"{i} Song{i}.aiff").touch()
    files = rwc_rec_files(root=str(tmp_path))
    assert len(files) == 100
    assert files[0].endswith("M01/1 Song1.aiff")
    assert files[59].endswith("M01/60 Song60.aiff")
    assert files[60].endswith("M02/1 Song1.aiff")


def test_load_aiff_raw(tmp_path, rng):
    """Round-trip through the stdlib aifc writer and both loaders."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import aifc

    from viterbi_spl_tpu.io.wav import _load_aiff_raw, load_aiff

    y = (rng.random(4000) * 2 - 1).astype(np.float32)
    pcm = (y * 32767).astype(">i2")
    path = tmp_path / "t.aiff"
    with aifc.open(str(path), "wb") as fh:
        fh.setnchannels(1)
        fh.setsampwidth(2)
        fh.setframerate(44100)
        fh.writeframes(pcm.tobytes())
    for loader in (load_aiff, _load_aiff_raw):
        out, sr = loader(path, True)
        assert sr == 44100
        np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0, atol=1e-6)


def test_tonet_f0ref_label(tmp_path, monkeypatch):
    """Yu's precomputed 10 ms f0 references from $fatnet_spec/f0ref
    (tonet/main_shaun.py:386-406)."""
    from viterbi_spl_tpu.data.labels import tonet_f0ref_label

    (tmp_path / "f0ref").mkdir()
    freqs = [0.0, 220.0, 220.0, 0.0, 440.0]
    with open(tmp_path / "f0ref" / "Song_MIX.txt", "w") as fh:
        for k, f in enumerate(freqs):
            fh.write(f"{float(k * 0.01)!r} {float(f)!r}\n")
    monkeypatch.setenv("fatnet_spec", str(tmp_path))
    lb = tonet_f0ref_label("Song")
    assert len(lb["notes"]) == 5
    assert lb["notes"][0] == 0.0
    assert abs(lb["notes"][1] - 57.0) < 1e-6  # 220 Hz = MIDI 57
    assert abs(lb["notes"][4] - 69.0) < 1e-6

    # interior misalignment must be rejected even when both endpoints are
    # on-grid (a dropped+duplicated row shifts every later frequency)
    with open(tmp_path / "f0ref" / "Bad_MIX.txt", "w") as fh:
        for k, t in enumerate((0.0, 0.01, 0.03, 0.03, 0.04)):
            fh.write(f"{t!r} {220.0!r}\n")
    with pytest.raises(ValueError):
        tonet_f0ref_label("Bad")

    # empty file: clean error, not IndexError
    (tmp_path / "f0ref" / "Empty_MIX.txt").write_text("")
    with pytest.raises(ValueError):
        tonet_f0ref_label("Empty")
    np.testing.assert_allclose(lb["original"]["freqs"], freqs)
