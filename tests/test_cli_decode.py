"""Batch-decode CLI: .dat artifacts + logit files -> MIREX txt / npz."""

import numpy as np


def _prepare(tmp_path, rng):
    from viterbi_spl_tpu.cli.hmm_artifacts import build_hmm_artifacts
    from viterbi_spl_tpu.families import family_spec

    spec = family_spec("tonet")
    track = np.clip(
        spec.n_bins // 2 + np.cumsum(rng.integers(-2, 3, 3000)),
        0, spec.n_bins - 1,
    )
    # mark some stretches unvoiced (bin n_bins) so switch stats are full
    voiced = np.repeat(rng.random(151) > 0.3, 20)[:3000]
    track = np.where(voiced, track, spec.n_bins)
    art = build_hmm_artifacts([track], spec, tmp_path / "hmm")

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    paths = []
    for i in range(3):
        T = 80 + 30 * i
        logits = rng.normal(-2, 1, (T, spec.n_bins)).astype(np.float32)
        path = np.clip(
            spec.n_bins // 2 + np.cumsum(rng.integers(-1, 2, T)),
            0, spec.n_bins - 1,
        )
        logits[np.arange(T), path] += 6.0
        p = in_dir / f"track{i}.npy"
        np.save(p, logits)
        paths.append(p)
    return art, paths


def test_decode_cli_txt_and_npz(tmp_path, rng):
    from viterbi_spl_tpu.cli import decode as D

    art, paths = _prepare(tmp_path, rng)
    out = D.main(
        [str(p) for p in paths]
        + ["--family", "tonet", "--artifacts", str(tmp_path / "hmm"),
           "--out", str(tmp_path / "txt"), "--format", "txt", "--batch", "2"]
    )
    assert len(out) == 3
    for i, p in enumerate(paths):
        txt = (tmp_path / "txt" / f"track{i}.txt").read_text().splitlines()
        assert len(txt) == len(out[i]["times"])
        t0, f0 = map(float, txt[0].split("\t"))
        assert t0 == 0.0 and f0 >= 0.0

    # npz output carries the decode vectors
    D.main(
        [str(paths[0]), "--family", "tonet", "--artifacts",
         str(tmp_path / "hmm"), "--out", str(tmp_path / "npz"),
         "--format", "npz"]
    )
    d = np.load(tmp_path / "npz" / "track0.npz")
    assert set(d.files) >= {"voiced", "bins", "est_notes", "freqs", "times"}
    # strong-signal frames should mostly decode voiced
    assert d["voiced"].mean() > 0.8


def test_decode_cli_matches_decoder_setup(tmp_path, rng):
    """The CLI's per-track output must equal a direct DecoderSetup decode."""
    from viterbi_spl_tpu.cli import decode as D

    art, paths = _prepare(tmp_path, rng)
    ns = D.main(
        [str(paths[1]), "--family", "tonet", "--artifacts",
         str(tmp_path / "hmm"), "--out", str(tmp_path / "o"),
         "--format", "npz"]
    )
    setup = D.build_setup(
        type("A", (), dict(
            family="tonet", artifacts=str(tmp_path / "hmm"),
            threshold=0.5, method="shaun",
        ))()
    )
    voiced, bins = setup.decode(np.load(paths[1]))
    np.testing.assert_array_equal(ns[0]["voiced"], voiced)
    np.testing.assert_array_equal(ns[0]["bins"], bins)


def test_decode_cli_skip_existing(tmp_path, rng, capsys):
    """Interrupted batch jobs restart idempotently: --skip-existing decodes
    only the tracks whose outputs are missing."""
    from viterbi_spl_tpu.cli import decode as D

    art, paths = _prepare(tmp_path, rng)
    base = ["--family", "tonet", "--artifacts", str(tmp_path / "hmm"),
            "--out", str(tmp_path / "txt"), "--format", "txt"]
    # simulate a partial run: only track0 decoded
    D.main([str(paths[0])] + base)
    t0_mtime = (tmp_path / "txt" / "track0.txt").stat().st_mtime_ns
    out = D.main([str(p) for p in paths] + base + ["--skip-existing"])
    assert len(out) == 2  # only the two missing tracks decoded
    assert "skipping 1" in capsys.readouterr().out
    # existing output untouched, all three present now
    assert (tmp_path / "txt" / "track0.txt").stat().st_mtime_ns == t0_mtime
    for i in range(3):
        assert (tmp_path / "txt" / f"track{i}.txt").exists()


def test_decode_cli_fused_obs_matches_default(tmp_path, rng):
    """--fused-obs (the Pallas serving path) must produce the same melody
    lines as the default path on clear-signal tracks — the documented
    tolerance is ulp-level in the observation values, which only moves
    decode outcomes on razor-edge ties that strong peaks don't have."""
    from viterbi_spl_tpu.cli import decode as D

    art, paths = _prepare(tmp_path, rng)
    base = ["--family", "tonet", "--artifacts", str(tmp_path / "hmm"),
            "--format", "npz", "--batch", "2"]
    D.main([str(p) for p in paths] + base + ["--out", str(tmp_path / "a")])
    D.main([str(p) for p in paths] + base
           + ["--out", str(tmp_path / "b"), "--fused-obs"])
    for i in range(3):
        a = np.load(tmp_path / "a" / f"track{i}.npz")
        b = np.load(tmp_path / "b" / f"track{i}.npz")
        np.testing.assert_array_equal(a["voiced"], b["voiced"])
        np.testing.assert_array_equal(a["bins"], b["bins"])


def test_decode_cli_mesh_matches_single_device(tmp_path, rng):
    """--mesh data=8 shards the decode batch's tracks over the CPU mesh;
    melody lines must be IDENTICAL to the single-device decode (the sharded
    path runs the same kernels per shard — track parallelism only changes
    placement, never the DP)."""
    from viterbi_spl_tpu.cli import decode as D

    art, paths = _prepare(tmp_path, rng)
    base = ["--family", "tonet", "--artifacts", str(tmp_path / "hmm"),
            "--format", "npz", "--batch", "3"]
    D.main([str(p) for p in paths] + base + ["--out", str(tmp_path / "a")])
    D.main([str(p) for p in paths] + base
           + ["--out", str(tmp_path / "b"), "--mesh", "data=8"])
    for i in range(3):
        a = np.load(tmp_path / "a" / f"track{i}.npz")
        b = np.load(tmp_path / "b" / f"track{i}.npz")
        np.testing.assert_array_equal(a["voiced"], b["voiced"])
        np.testing.assert_array_equal(a["bins"], b["bins"])


def test_decode_cli_mesh_malformed_exits(tmp_path, rng):
    import pytest

    from viterbi_spl_tpu.cli import decode as D

    art, paths = _prepare(tmp_path, rng)
    for bad in ("8", "data=abc", "seq=2"):
        with pytest.raises(SystemExit):
            D.main(
                [str(paths[0]), "--family", "tonet", "--artifacts",
                 str(tmp_path / "hmm"), "--out", str(tmp_path / "x"),
                 "--mesh", bad]
            )
