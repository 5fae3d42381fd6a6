"""On-chip latency of the batched streaming decoder (StreamingViterbiBatch).

Serving shape: a pool of M live channels at 361 bins (tonet config), 10 ms
hops pushed in hop-sized chunks, fixed lag. Reports ms per push (one push =
hop frames across ALL channels) and the implied real-time factor.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_streaming_bench.py
"""

import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vspl_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from viterbi_spl_tpu.hmm import params as hmm_params
from viterbi_spl_tpu.hmm.streaming import StreamingViterbiBatch


def main():
    rng = np.random.default_rng(0)
    n_bins, M, hop, lag = 360, 128, 128, 128
    S = n_bins + 1
    q = [np.clip(180 + np.cumsum(rng.integers(-3, 4, 5000)), 0, n_bins - 1)]
    st = hmm_params.count_statistics(q, n_bins)
    A = hmm_params.shape_transition_matrix(
        st.transition_counts, np.array([[0.98, 0.02], [0.02, 0.98]]),
        n_bins, hmm_params.single_side_d_max(0.01, 60), floor=2,
    )
    pi = hmm_params.shape_init_probs(st.p_steady, p_th=1e-4)

    import jax.numpy as jnp

    pool = StreamingViterbiBatch(A, pi, n_streams=M, lag=lag)
    obs = rng.random((M, hop, S)).astype(np.float32)
    obs /= obs.sum(-1, keepdims=True)
    # pre-stage the chunk on device: through the axon tunnel a 23.6 MB H2D
    # costs ~500 ms of NETWORK time, which a real TPU host (PCIe) does not
    # pay — the measurement here is the decoder step + the emitted-states
    # readback (which serving must do every push anyway)
    obs_dev = jnp.asarray(obs).block_until_ready()

    # warm up into steady state (both push shapes compiled: pre-lag and
    # steady emission)
    for _ in range(3):
        pool.push(obs_dev)

    n_pushes = 20
    t0 = time.perf_counter()
    emitted = 0
    for _ in range(n_pushes):
        out = pool.push(obs_dev)
        emitted += out.shape[1]
    dt = (time.perf_counter() - t0) / n_pushes
    audio_s = hop * 0.01  # 10 ms hop
    print(
        f"streams={M} bins={n_bins} hop={hop} lag={lag}: "
        f"{dt * 1e3:.2f} ms/push ({emitted // n_pushes} frames emitted/push), "
        f"{M * audio_s / dt:.0f}x realtime aggregate "
        f"({M * hop / dt / 1e6:.2f} M frames/s)"
    )

    # ---- drain frontier (round-5 VERDICT #7): ms/push vs burst latency
    # over StreamingDrain(every). The pipelined residual above the device
    # push time is RTT/every by construction; the burst latency a consumer
    # pays is every * hop * 10 ms of audio per drain. Pick the default
    # from this curve.
    from viterbi_spl_tpu.hmm.streaming import StreamingDrain

    print("\nevery  ms/push  device-ms  burst-latency-ms  aggregate-x")
    for every in (1, 4, 8, 16, 32, 64):
        drain = StreamingDrain(
            StreamingViterbiBatch(A, pi, n_streams=M, lag=lag), every=every
        )
        for _ in range(2 * every + 2):  # compile both concat shapes
            drain.push(obs_dev)
        n = max(2 * every, 16)
        t0 = time.perf_counter()
        for _ in range(n):
            drain.push(obs_dev)
        dtp = (time.perf_counter() - t0) / n
        print(
            f"{every:5d}  {dtp * 1e3:7.2f}  "
            f"{'-':>9}  {every * hop * 10:16d}  "
            f"{M * audio_s / dtp:11.0f}"
        )


if __name__ == "__main__":
    main()
