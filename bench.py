"""Benchmark: Viterbi-decoded frames/sec/chip at 361 pitch bins.

The driver metric (BASELINE.json): dense-transition max-plus Viterbi decode
throughput on one TPU chip, 361 states (tonet configuration, padded to 384
lanes), forward DP + backtrace, decoded states produced on device.

Headline: the batched decoder (N tracks share the VMEM-resident transition
structure — the serving shape of BASELINE config 4) running the EXACT
banded fast path on a shaped melody transition matrix (all five NN
families' matrices have this structure; see hmm/viterbi_banded.py). The
decode is verified against the reference-semantics NumPy oracle inside the
same run (track 0's full-length path is replayed on the host, ~3.5 s; no
extra kernel compiles — remote Mosaic compiles are the expensive part).

The default detail also carries the end-to-end serving chains (raw logits
-> fused Pallas observation kernel -> banded decode) at 361 and 722 bins
with in-run oracle checks, and the banded-vs-dense on-device equality check
— the driver artifact tracks serving progress per round (round-2 VERDICT
Weak #6). Set BENCH_FULL=1 to also time the dense-matrix batched kernel and
the single-track kernel (extra compiles).

vs_baseline compares against the reference's canonical optimized NumPy
decoder (dcnet/tf_viterbi_decoding.py:156-207 semantics, hmm/oracle.py) on
this host — the reference publishes no throughput numbers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vspl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viterbi_spl_tpu.hmm import params as hmm_params
    from viterbi_spl_tpu.hmm.viterbi import prepare_log_params
    from viterbi_spl_tpu.hmm.viterbi_banded import (
        extract_banded_structure,
        viterbi_backtrace_pallas_banded_batch,
        viterbi_forward_pallas_banded_batch,
    )
    from viterbi_spl_tpu.hmm.viterbi_pallas import viterbi_backtrace_pallas_batch

    n_bins = 360  # tonet configuration
    S, P = n_bins + 1, 384
    T = 1 << 15  # frames per track (~5.5 min of audio at 10 ms)
    N = 128  # tracks decoded together
    BLOCK = 64

    rng = np.random.default_rng(0)
    # shaped (banded + switch-coupled) transition matrix — the real melody
    # HMM structure, built through the parameter-estimation pipeline
    qtracks = [np.clip(180 + np.cumsum(rng.integers(-3, 4, 5000)), 0, n_bins - 1)]
    stats = hmm_params.count_statistics(qtracks, n_bins)
    A = hmm_params.shape_transition_matrix(
        stats.transition_counts,
        np.array([[0.98, 0.02], [0.02, 0.98]]),
        n_bins,
        hmm_params.single_side_d_max(0.01, 60),
        floor=2,
    )
    pi = hmm_params.shape_init_probs(stats.p_steady, p_th=1e-4)
    log_B, log_pi = prepare_log_params(A, pi, pad_to=P)
    log_B_d, log_pi_d = jnp.asarray(log_B), jnp.asarray(log_pi)
    bstruct = extract_banded_structure(A, P)
    assert bstruct is not None, "shaped matrix must be banded"

    key = jax.random.PRNGKey(0)
    log_obs_b = jax.random.uniform(key, (N, T, P), jnp.float32, -20.0, 0.0)
    log_obs_b = jnp.where(
        jnp.arange(P)[None, None, :] < S, log_obs_b, jnp.float32(-1e30)
    ).block_until_ready()
    # all tracks carry their full length: the kernel specializes to the
    # mask-free full-length path, and track 0's decode is oracle-checked
    # over ALL T frames on the host (~3.5 s, once)
    lens_np = np.full(N, T, np.int32)
    lens = jnp.asarray(lens_np)
    frames_per_iter = int(lens_np.sum())

    @jax.jit
    def decode_banded(o):
        t1, t1m1 = viterbi_forward_pallas_banded_batch(
            bstruct, log_pi_d, o, lens, block_frames=BLOCK, interpret=False
        )
        last = jnp.argmax(t1, axis=1).astype(jnp.int32)
        return viterbi_backtrace_pallas_banded_batch(
            bstruct, t1m1, last, lens, block_frames=BLOCK, interpret=False
        )

    # warmup/compile (checksum forces completion through the async host)
    states = decode_banded(log_obs_b)
    chk = int(jnp.sum(states % 7))
    ok = _oracle_check(
        np.asarray(log_obs_b[0, :, :S]), log_B, log_pi,
        np.asarray(states[0]), S,
    )

    def timed(fn, arg, frames, iters=8):
        # queue all iterations, then drain with ONE scalar readback: each
        # readback through the axon async host costs ~25 ms regardless of
        # size, so syncing inside the loop (or draining each iteration's
        # checksum separately) would charge the device for host latency
        # (serving streams batches back-to-back without per-batch syncs).
        # Summing the per-iteration checksums into one scalar still forces
        # every iteration to full completion before the clock stops.
        t0 = time.perf_counter()
        sums = [jnp.sum(fn(arg) % 7) for _ in range(iters)]
        _ = int(sum(sums))
        dt = (time.perf_counter() - t0) / iters
        return frames / dt, dt

    fps_banded, dt_b = timed(decode_banded, log_obs_b, frames_per_iter)

    # reference-semantics NumPy decoder baseline
    from viterbi_spl_tpu.hmm.oracle import viterbi_oracle

    T_REF = 4000
    obs_ref = np.exp(np.asarray(log_obs_b[1, :T_REF, :S], np.float64))
    obs_ref = (obs_ref / obs_ref.sum(axis=1, keepdims=True)).astype(np.float32).T
    t0 = time.perf_counter()
    viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs_ref)
    ref_fps = T_REF / (time.perf_counter() - t0)

    # Floor-relative utilization (round-5 VERDICT #6): the DESIGN §3b
    # measured/op-count floors at THIS shape (N=128, T=32768, P=384,
    # BLOCK=64) make per-round ms drift classifiable as noise vs
    # regression at a glance. Constants, with provenance:
    # - forward ALU floor 30 ms: the no-roll ablation of the banded
    #   forward kernel (all compute, rolls removed) — DESIGN §3b table,
    # - backtrace op-count floor 30 ms: ~30 vector ops + 2 lane
    #   reductions per frame ≈ 940 cyc — DESIGN §3b table (measured 32.6
    #   ms is within ~10% of it).
    FWD_FLOOR_MS, BT_FLOOR_MS = 30.0, 30.0
    DECODE_FLOOR_MS = FWD_FLOOR_MS + BT_FLOOR_MS

    detail = {
        "S": S,
        "padded_S": P,
        "transition": "shaped banded (d_max=%d) via exact banded kernel"
        % bstruct.d_max,
        "tracks_per_batch": N,
        "frames_per_track": T,
        "banded_batch_decode_ms": round(dt_b * 1e3, 3),
        "decode_pct_of_floor": round(100.0 * DECODE_FLOOR_MS / (dt_b * 1e3), 1),
        "numpy_reference_fps": round(ref_fps, 1),
        "path_matches_oracle": bool(ok),
    }

    from viterbi_spl_tpu.hmm.viterbi_pallas import (
        viterbi_backtrace_pallas,
        viterbi_forward_pallas,
        viterbi_forward_pallas_batch,
    )

    lens16 = jnp.full((16,), T, jnp.int32)

    @jax.jit
    def decode_dense16(o):
        t1, t1m1 = viterbi_forward_pallas_batch(
            log_B_d, log_pi_d, o, lens16, block_frames=BLOCK, interpret=False
        )
        last = jnp.argmax(t1, axis=1).astype(jnp.int32)
        return viterbi_backtrace_pallas_batch(
            t1m1, log_B_d, last, lens16, block_frames=BLOCK, interpret=False
        )

    _ = int(jnp.sum(decode_dense16(log_obs_b[:16]) % 7))
    detail["banded_equals_dense_on_device"] = bool(
        jnp.all(decode_banded(log_obs_b)[1:16] == decode_dense16(log_obs_b[:16])[1:])
    )

    if os.environ.get("BENCH_FULL") == "1":
        @jax.jit
        def decode_single(o):
            t1, t1m1 = viterbi_forward_pallas(
                log_B_d, log_pi_d, o, T, block_frames=512, interpret=False
            )
            last = jnp.argmax(t1).astype(jnp.int32)
            return viterbi_backtrace_pallas(
                t1m1, log_B_d, last, T, block_frames=512, interpret=False
            )

        fps_dense, _ = timed(decode_dense16, log_obs_b[:16], 16 * T)
        _ = int(jnp.sum(decode_single(log_obs_b[1]) % 7))
        fps_single, _ = timed(decode_single, log_obs_b[1], T)
        detail["dense_batch16_fps"] = round(fps_dense, 1)
        detail["single_track_fps"] = round(fps_single, 1)

    # end-to-end serving (default detail): raw logits -> direct-log Pallas
    # shaun observation kernel -> banded decode, all on-chip (the
    # --fused-obs CLI path). The in-forward-obs variant is bit-equal but
    # measured slower e2e (DESIGN §3b). Free the headline observations
    # first (6.4 GB at N=128).
    del log_obs_b

    from viterbi_spl_tpu.hmm.obs_pallas import (
        pad_logits_reflect,
        shaun_log_obs_pallas,
    )

    T_SRV = 1 << 13  # logits + log-obs + t1m1 all resident
    spw = 5
    raw_logits = jax.random.normal(
        jax.random.PRNGKey(2), (N, T_SRV, n_bins), jnp.float32
    ) - 2.0
    padded = jnp.asarray(
        pad_logits_reflect(raw_logits, spw, P)
    ).block_until_ready()
    lens_srv = jnp.full((N,), T_SRV, jnp.int32)

    @jax.jit
    def serve(pl_in, l):
        log_obs = shaun_log_obs_pallas(
            pl_in, n_bins, spw, 0.0, block_frames=32, interpret=False
        )
        t1, t1m1 = viterbi_forward_pallas_banded_batch(
            bstruct, log_pi_d, log_obs, l, block_frames=BLOCK,
            interpret=False,
        )
        last = jnp.argmax(t1, axis=1).astype(jnp.int32)
        return viterbi_backtrace_pallas_banded_batch(
            bstruct, t1m1, last, l, block_frames=BLOCK, interpret=False
        )

    _ = int(jnp.sum(serve(padded, lens_srv) % 7))

    def timed_srv():
        t0 = time.perf_counter()
        sums = [jnp.sum(serve(padded, lens_srv) % 7) for _ in range(8)]
        _ = int(sum(sums))
        return N * T_SRV / ((time.perf_counter() - t0) / 8)

    srv_fps = timed_srv()
    detail["serving_fused_obs_decode_fps"] = round(srv_fps, 1)
    # serving floor at this shape: obs copy floor 7.8 ms for the
    # [128, 8192, 384] / block_frames=32 pattern (measured achievable DMA,
    # scripts/tpu_obs_floor.py — the "819 GB/s" spec is not reachable on
    # this part; DESIGN §3b.1) + the decode floor scaled to T_SRV frames.
    OBS_FLOOR_MS = 7.8
    srv_floor_ms = OBS_FLOOR_MS + DECODE_FLOOR_MS * T_SRV / T
    srv_floor_fps = N * T_SRV / (srv_floor_ms * 1e-3)
    detail["serving_pct_of_floor"] = round(100.0 * srv_fps / srv_floor_fps, 1)

    # 722-bin serving chain (jdc configuration: 721 bins + unvoiced,
    # spw=16, d_max=40, P=768) — obs kernel + banded decode end to end,
    # oracle-checked on a short track 0 against the kernel's own
    # log-observations (decode exactness; the obs kernel's tolerance
    # contract is tested separately)
    n_bins2, spw2, P2 = 721, 16, 768
    S2 = n_bins2 + 1
    N2, T2, T2_CHK = 64, 1 << 12, 1024
    # free the 361-bin serving inputs first: logits + obs + t1m1 at
    # [64, 4096, 768] is ~2.4 GB live, on top of the headline arrays
    del padded
    raw_logits = None  # noqa: F841 — drop the device reference
    q2 = [np.clip(360 + np.cumsum(rng.integers(-3, 4, 5000)), 0, n_bins2 - 1)]
    stats2 = hmm_params.count_statistics(q2, n_bins2)
    A2 = hmm_params.shape_transition_matrix(
        stats2.transition_counts,
        np.array([[0.98, 0.02], [0.02, 0.98]]),
        n_bins2,
        40,
        floor=2,
    )
    pi2 = hmm_params.shape_init_probs(stats2.p_steady, p_th=1e-4)
    log_B2, log_pi2 = prepare_log_params(A2, pi2, pad_to=P2)
    log_B2_d, log_pi2_d = jnp.asarray(log_B2), jnp.asarray(log_pi2)
    bs2 = extract_banded_structure(A2, P2)
    assert bs2 is not None

    raw2 = jax.random.normal(
        jax.random.PRNGKey(3), (N2, T2, n_bins2), jnp.float32
    ) - 2.0
    padded2 = jnp.asarray(
        pad_logits_reflect(raw2, spw2, P2)
    ).block_until_ready()
    lens2_np = np.full(N2, T2, np.int32)
    lens2_np[0] = T2_CHK
    lens2 = jnp.asarray(lens2_np)

    @jax.jit
    def serve722(pl_in, l):
        log_obs = shaun_log_obs_pallas(
            pl_in, n_bins2, spw2, 0.0, block_frames=32, interpret=False
        )
        t1, t1m1 = viterbi_forward_pallas_banded_batch(
            bs2, log_pi2_d, log_obs, l, block_frames=BLOCK,
            interpret=False,
        )
        last = jnp.argmax(t1, axis=1).astype(jnp.int32)
        return viterbi_backtrace_pallas_banded_batch(
            bs2, t1m1, last, l, block_frames=BLOCK, interpret=False
        )

    states722 = serve722(padded2, lens2)
    _ = int(jnp.sum(states722 % 7))
    # oracle-check against the obs kernel's own log observations
    # (materialized once, outside the timed path)
    log_obs722_chk = np.asarray(
        shaun_log_obs_pallas(
            padded2[:8, :T2_CHK], n_bins2, spw2, 0.0, block_frames=32,
            interpret=False,
        )[0, :, :S2]
    )
    detail["serving_722_path_matches_oracle"] = bool(
        _oracle_check(
            log_obs722_chk, log_B2, log_pi2,
            np.asarray(states722[0, :T2_CHK]), S2,
        )
    )

    def timed_722():
        t0 = time.perf_counter()
        sums = [jnp.sum(serve722(padded2, lens2) % 7) for _ in range(8)]
        _ = int(sum(sums))
        return int(lens2_np.sum()) / ((time.perf_counter() - t0) / 8)

    detail["serving_fused_obs_decode_fps_722"] = round(timed_722(), 1)

    # fixed-lag streaming pool (TPU-native serving path): ms per push of
    # `hop` frames across M live channels at 361 bins, split three ways:
    # - sync: one emitted-states readback per push (~25 ms axon tunnel
    #   RTT on this host — 97% of the sync number, pure transfer latency),
    # - device: pushes chained on device, ONE readback at the end — the
    #   device compute + dispatch cost a local TPU host would pay,
    # - pipelined: StreamingDrain (default every=32, the measured
    #   frontier optimum) amortizes the RTT over a device-side concat
    #   (what THIS host should serve with when burst emission is
    #   acceptable).
    from viterbi_spl_tpu.hmm.streaming import StreamingDrain, StreamingViterbiBatch

    M, hop, lag = 128, 128, 128
    pool = StreamingViterbiBatch(A, pi, n_streams=M, lag=lag)
    obs_push = rng.random((M, hop, S)).astype(np.float32)
    obs_push /= obs_push.sum(-1, keepdims=True)
    obs_push_d = jnp.asarray(obs_push).block_until_ready()
    for _ in range(3):  # compile both push shapes (pre-lag + steady)
        pool.push(obs_push_d)
    n_pushes = 10
    t0 = time.perf_counter()
    for _ in range(n_pushes):
        pool.push(obs_push_d)
    dt_push = (time.perf_counter() - t0) / n_pushes
    detail["streaming_ms_per_push_128ch"] = round(dt_push * 1e3, 2)
    detail["streaming_realtime_aggregate_x"] = round(M * hop * 0.01 / dt_push)

    # device-only: queue a long push chain (each push's carry depends on
    # the previous, so the LAST output transitively waits for all of
    # them), read back only that last [M, hop] block — one transfer whose
    # RTT amortizes over the chain
    pool_dev = StreamingViterbiBatch(A, pi, n_streams=M, lag=lag)
    for _ in range(3):  # compile first + steady push shapes
        pool_dev.push_device(obs_push_d)
    _ = np.asarray(pool_dev.push_device(obs_push_d))  # warm readback
    n_dev = 32
    t0 = time.perf_counter()
    outs = [pool_dev.push_device(obs_push_d) for _ in range(n_dev)]
    _ = np.asarray(outs[-1])
    dt_dev = (time.perf_counter() - t0) / n_dev
    detail["streaming_ms_per_push_device"] = round(dt_dev * 1e3, 2)
    # per-push kernel-time floor: the M*hop frames of DP work a push
    # carries, priced at the batch decode floor rate (the streaming
    # kernel additionally re-decodes the lag window and pays per-push
    # dispatch — the pct shows how much of the device push is that
    # overhead vs irreducible DP)
    push_floor_ms = DECODE_FLOOR_MS * (M * hop) / (N * T)
    detail["streaming_device_push_pct_of_floor"] = round(
        100.0 * push_floor_ms / (dt_dev * 1e3), 1
    )

    # pipelined: one host transfer per EVERY pushes (StreamingDrain).
    # every=32 is the measured optimum of the drain frontier on this host
    # (scripts/tpu_streaming_bench.py round-5 sweep: 28.5/8.1/5.2/3.5/
    # 2.7/3.5 ms/push at every=1/4/8/16/32/64 — the 64 point regresses on
    # drained-block transfer size). Warm-up covers BOTH drain-concat
    # shapes (the first drain sees every-1 emitting pushes, steady drains
    # see every) so no compile lands in the timed loop.
    EVERY = 32
    drain = StreamingDrain(
        StreamingViterbiBatch(A, pi, n_streams=M, lag=lag), every=EVERY
    )
    for _ in range(2 * EVERY + 2):
        drain.push(obs_push_d)
    n_pipe = 2 * EVERY
    t0 = time.perf_counter()
    for _ in range(n_pipe):
        drain.push(obs_push_d)
    dt_pipe = (time.perf_counter() - t0) / n_pipe
    detail["streaming_ms_per_push_pipelined"] = round(dt_pipe * 1e3, 2)
    detail["streaming_realtime_aggregate_pipelined_x"] = round(
        M * hop * 0.01 / dt_pipe
    )

    result = {
        "metric": "viterbi_decode_frames_per_sec_per_chip_361bins",
        "value": round(fps_banded, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps_banded / ref_fps, 2),
        "detail": detail,
    }
    print(json.dumps(result))


def _oracle_check(log_obs, log_B, log_pi, got, S):
    """Replicate the oracle DP directly in log domain (no prob round trip)."""
    T = log_obs.shape[0]
    T1 = log_pi[:S] + log_obs[0]
    T2 = np.zeros((T, S), np.int64)
    for t in range(1, T):
        scores = T1[None, :] + log_B[:S, :S]
        T2[t] = np.argmax(scores, axis=1)
        T1 = scores[np.arange(S), T2[t]] + log_obs[t]
    states = np.empty(T, np.int64)
    s = int(np.argmax(T1))
    states[-1] = s
    for t in range(T - 2, -1, -1):
        s = T2[t + 1, s]
        states[t] = s
    return np.array_equal(states, got)


if __name__ == "__main__":
    main()
