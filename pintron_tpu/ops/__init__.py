"""Device-side (JAX/XLA) batched compute ops for the TPU path."""

from pintron_tpu.ops.align import (banded_edit_distance,
                                   batch_edit_distance_score)
from pintron_tpu.ops.pwm import pwm_scores

__all__ = ["banded_edit_distance", "batch_edit_distance_score",
           "pwm_scores"]
