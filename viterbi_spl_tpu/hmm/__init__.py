from .oracle import viterbi_oracle
from .viterbi import viterbi_decode_jax, viterbi_forward_jax, viterbi_backtrace_jax

__all__ = [
    "viterbi_oracle",
    "viterbi_decode_jax",
    "viterbi_forward_jax",
    "viterbi_backtrace_jax",
]
