"""Batched PWM splice-site scoring as an MXU matmul.

MatInspector scoring (reference: src/classify-intron.c:620-663) over a
batch of fixed-width windows: one-hot encode the window bases and contract
against the consensus-weighted PWM.  score = (sum_i cv_i * pwm[base_i, i])
/ (sum_i cv_i * max_i), vectorized as a (B, L*4) x (L*4,) product.
"""

from __future__ import annotations

import numpy as np

from pintron_tpu.factorize.pwm_data import CV, MAXV, PWM

# jax is imported lazily: under the device-service model the worker
# processes call pwm_tables/encode_windows but never run the device op,
# and a jax import costs seconds per spawned worker on small loci.

_BASE = np.full(256, -1, dtype=np.int32)
for i, chars in enumerate(["Aa", "Cc", "Gg", "Tt"]):
    for ch in chars:
        _BASE[ord(ch)] = i
_BASE[ord("N")] = 0
_BASE[ord("n")] = 0


def pwm_tables(name: str):
    """Return (weighted_pwm (4, L), denominator) for a matrix name."""
    pwm = np.asarray(PWM[name], dtype=np.float32)       # (4, L)
    cv = np.asarray(CV[name], dtype=np.float32)          # (L,)
    maxv = np.asarray(MAXV[name], dtype=np.float32)      # (L,)
    return pwm * cv[None, :], float(np.dot(cv, maxv))


def encode_windows(windows, L: int) -> np.ndarray:
    """Host helper: strings -> (B, L) int32 base indices."""
    out = np.zeros((len(windows), L), dtype=np.int32)
    for i, w in enumerate(windows):
        b = np.frombuffer(w[:L].encode("latin1"), dtype=np.uint8)
        idx = _BASE[b]
        out[i, :len(b)] = np.where(idx >= 0, idx, 3)
    return out


_PWM_SCORES_JIT = None


def pwm_scores(base_idx, weighted_pwm, *, denominator: float):
    """Batched MatInspector scores.

    Args:
      base_idx: (B, L) int32 base indices (0..3).
      weighted_pwm: (4, L) float32, pwm * cv.
      denominator: static scalar sum(cv * maxv).

    Returns: (B,) float32 scores in [0, 1].
    """
    global _PWM_SCORES_JIT
    if _PWM_SCORES_JIT is None:
        import functools

        import jax
        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnames=("denominator",))
        def _impl(base_idx, weighted_pwm, *, denominator: float):
            onehot = jax.nn.one_hot(base_idx, 4,
                                    dtype=jnp.float32)  # (B, L, 4)
            # precision=highest: full-f32 multiplies — the TPU MXU
            # default truncates operands to bf16, which would break the
            # f32-vs-f64 epsilon bound the exact-finishing pass relies on
            picked = jnp.einsum("blc,cl->b", onehot, weighted_pwm,
                                precision=jax.lax.Precision.HIGHEST)
            return picked / denominator

        _PWM_SCORES_JIT = _impl
    return _PWM_SCORES_JIT(base_idx, weighted_pwm,
                           denominator=denominator)
