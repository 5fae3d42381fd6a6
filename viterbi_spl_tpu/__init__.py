"""viterbi_spl_tpu — TPU-native melody-extraction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
drwangxian/viterbi_spl (the accompanying code of X. Wang, "Hidden Markov
Model for Extracting Continuous Melody Lines from Neural Network Outputs",
IEEE SPL): spectral front-ends (STFT/CFP/NSGT), six acoustic model families
(dcnet/msnet/ftanet/jdc/tonet/imm), dense-transition HMM/Viterbi melody
post-processing, melody metrics, and a pod-scale sharded decoding path.

Layering (bottom -> top), mirroring the reference layer map (SURVEY.md §1):

  io/        .dat array format, wav loading, label readers, dataset splits
  frontend/  STFT/ISTFT, CFP, NSGT front-ends (jnp FFT, blocked with halos)
  hmm/       HMM parameter estimation, observation models, Viterbi decoders
             (NumPy oracle, jax lax.scan, Pallas max-plus kernel, sharded)
  models/    acoustic models (flax) + IMM NMF (pure jnp)
  data/      track registry, snippet pipeline
  metrics/   vectorized melody metrics + self-contained mir_eval-semantics
  dist/      device meshes, time-block sharded decoding
  harness/   training/eval loops, checkpointing, early stopping, reporting
  native/    C++ runtime components (backtrace, CPU reference decoder)
"""

__version__ = "0.1.0"
