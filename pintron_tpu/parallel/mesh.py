"""Device-mesh data parallelism for the alignment engine.

The reference's only implicit parallel axis is per-EST independence
(main-est-fact.c:249-291: every EST's MEG + factorization reads only the
shared read-only genomic index).  The TPU-native design makes that axis
explicit:

* ``data`` axis: EST windows are sharded across devices; each shard runs
  the batched DP/PWM scoring locally.
* ``seq`` axis: genomic-index construction work (k-mer histograms) is
  sharded along the locus; results are combined with ``psum`` so every
  device holds the replicated index.
* candidate intron support counts are merged with ``psum`` over ``data``
  — the deterministic, order-invariant equivalent of the reference's
  global intron registry (main-intron-agreement.c:170-287).

Everything below is jit-compiled over an explicit Mesh via shard_map, so
the same code runs on 1 chip, 1 host or N hosts; collectives ride ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pintron_tpu.ops.align import banded_edit_distance
from pintron_tpu.ops.pwm import pwm_scores, pwm_tables


def make_mesh(n_data: int, n_seq: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_seq
    dev = np.array(devices[: n_data * n_seq]).reshape(n_data, n_seq)
    return Mesh(dev, ("data", "seq"))


def alignment_step(est_codes, est_lens, gen_codes, gen_lens, bands,
                   donor_idx, weighted_pwm, intron_ids, n_introns: int,
                   *, max_rows: int, k_max: int, denominator: float):
    """Single-device batched scoring step (the body shard_map runs).

    Computes banded distances for (EST window, genomic window) pairs and
    donor PWM scores, then scatters per-candidate intron support counts.
    Returns (distances, scores, local support histogram).
    """
    dist = banded_edit_distance(gen_codes, gen_lens, est_codes, est_lens,
                                bands, max_rows=max_rows, k_max=k_max)
    scores = pwm_scores(donor_idx, weighted_pwm, denominator=denominator)
    ok = (dist <= bands).astype(jnp.int32)
    support = jnp.zeros((n_introns,), jnp.int32).at[intron_ids].add(ok)
    return dist, scores, support


def sharded_alignment_step(mesh: Mesh, n_introns: int, *, max_rows: int,
                           k_max: int, denominator: float):
    """Build the pjit-ed multi-chip step over `mesh`.

    EST batches are sharded over ``data``; the genomic k-mer histogram is
    computed from locus shards over ``seq`` and all-reduced; intron
    support is all-reduced over ``data`` so the output registry is
    replicated and bit-identical on every device.
    """
    from jax.experimental.shard_map import shard_map

    def step(est_codes, est_lens, gen_codes, gen_lens, bands, donor_idx,
             weighted_pwm, intron_ids, locus_shard):
        dist, scores, support = alignment_step(
            est_codes, est_lens, gen_codes, gen_lens, bands, donor_idx,
            weighted_pwm, intron_ids, n_introns,
            max_rows=max_rows, k_max=k_max, denominator=denominator)
        # deterministic global merge of the intron registry
        support = jax.lax.psum(support, "data")
        support = jax.lax.psum(support, "seq")
        # replicated genomic base histogram from locus shards (stands in
        # for the k-mer index build: shard over seq, all-reduce)
        hist = jnp.zeros((4,), jnp.int32).at[
            jnp.clip(locus_shard, 0, 3)].add(1)
        hist = jax.lax.psum(hist, "seq")
        hist = jax.lax.pmax(hist, "data")  # identical on all data shards
        return dist, scores, support, hist

    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P("data", None), P("data"), P("data", None), P("data"),
                  P("data"), P("data", None), P(None, None), P("data"),
                  P("seq")),
        out_specs=(P("data"), P("data"), P(), P()),
        check_rep=False,
    ))


def example_batch(batch: int = 64, n_max: int = 256, m_max: int = 192,
                  k_max: int = 16, pwm_name: str = "P5_GTAG_U2",
                  n_introns: int = 32, locus_len: int = 1024, seed: int = 0):
    """Synthetic but realistically-shaped inputs for compile checks."""
    rng = np.random.default_rng(seed)
    gen_codes = rng.integers(0, 4, (batch, n_max), dtype=np.int8)
    est_codes = rng.integers(0, 4, (batch, m_max), dtype=np.int8)
    gen_lens = rng.integers(m_max // 2, n_max, (batch,), dtype=np.int32)
    est_lens = np.minimum(
        rng.integers(m_max // 2, m_max, (batch,), dtype=np.int32), gen_lens)
    bands = np.full((batch,), k_max, dtype=np.int32)
    wpwm, denom = pwm_tables(pwm_name)
    L = wpwm.shape[1]
    donor_idx = rng.integers(0, 4, (batch, L), dtype=np.int32)
    intron_ids = rng.integers(0, n_introns, (batch,), dtype=np.int32)
    locus = rng.integers(0, 4, (locus_len,), dtype=np.int32)
    return (est_codes, est_lens, gen_codes, gen_lens, bands, donor_idx,
            wpwm.astype(np.float32), intron_ids, locus), denom
