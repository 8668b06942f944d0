"""K-mer index: recall vs the suffix-tree seeding on real data.

Every maximal pairing the GST scanner emits must be recoverable from the
k-mer index's maximal left-maximal matches (the index is the batched
seeding substrate; MEG shaping on top stays identical)."""

import numpy as np
import pytest

from pintron_tpu.index.gst import SuffixTree
from pintron_tpu.index.kmer import KmerIndex
from pintron_tpu.meg.graph import build_vertex_set
from pintron_tpu.config import Config


def _random_seq(rng, n):
    return bytes(rng.choice(list(b"ACGT"), n))


def test_kmer_maximal_matches_brute_force():
    rng = np.random.default_rng(5)
    gen = _random_seq(rng, 400)
    pat = gen[50:90] + _random_seq(rng, 30) + gen[200:260]
    idx = KmerIndex(gen, k=12)
    got = set(idx.maximal_matches(pat, min_len=15))
    # brute force: all left-maximal matches >= 15
    expect = set()
    for p in range(len(pat)):
        for t in range(len(gen)):
            if p > 0 and t > 0 and pat[p - 1] == gen[t - 1]:
                continue
            l = 0
            while p + l < len(pat) and t + l < len(gen) \
                    and pat[p + l] == gen[t + l]:
                l += 1
            if l >= 15:
                expect.add((p, t, l))
    assert got == expect


def test_kmer_recalls_gst_pairings():
    rng = np.random.default_rng(11)
    gen = _random_seq(rng, 600)
    pat = gen[100:160] + _random_seq(rng, 20) + gen[350:420]
    cfg = Config()
    tree = SuffixTree(gen)
    V = build_vertex_set(pat, tree, gen, cfg)
    idx = KmerIndex(gen, k=12)
    matches = idx.maximal_matches(pat, min_len=cfg.min_factor_len)
    # pairing (p,t,l) from the GST is a (possibly clipped) prefix of a
    # maximal match at the same diagonal covering [p, p+l)
    cover = {}
    for (p, t, l) in matches:
        cover.setdefault(t - p, []).append((p, p + l))
    missing = []
    for col in V:
        for pr in col:
            if pr.is_source() or pr.is_sink():
                continue
            spans = cover.get(pr.t - pr.p, [])
            if not any(s <= pr.p and pr.p + pr.l <= e for (s, e) in spans):
                missing.append((pr.p, pr.t, pr.l))
    assert not missing, missing[:5]


def test_kmer_device_lookup_matches_host():
    rng = np.random.default_rng(3)
    gen = _random_seq(rng, 300)
    idx = KmerIndex(gen, k=12)
    q = idx.query_hashes(gen[40:120])
    lo_h, hi_h = idx.lookup_ranges(q)
    lo_d, hi_d = idx.lookup_ranges_device(q)
    assert (np.asarray(lo_d) == lo_h).all()
    assert (np.asarray(hi_d) == hi_h).all()
