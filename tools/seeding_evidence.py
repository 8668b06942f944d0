#!/usr/bin/env python
"""Evidence that the reference's pairing emission is traversal-history
dependent — settling the "can a batched k-mer index replace the suffix
tree walk exactly?" question (DESIGN.md, "Seeding index").

The reference seeds MEG vertices by walking the suffix tree with suffix
links (max-emb-graph.c:58-163 + 247-338).  A pure per-position seeding
function (what a batched k-mer/suffix-array lookup computes) would have
to equal a FRESH root descent at every position.  This script compares
the two walks' emitted pairing sets:

  * minimal counterexample (printed first): a 131 nt A/C-repeat locus and
    the 12 nt pattern CCCAAACACCCA.  At position 1 the fresh descent is
    avoid-pruned at depth 2 and emits ten (p=1, t, l=2) pairings; the
    suffix-link walk resumes deep from position 0's match (d=11), so its
    emission cutoff min_sd = max(rate*d, min_len) = 2.2 EXCLUDES depth 2
    — none of those pairings exist in the reference's output.  The
    emitted set therefore depends on the walk state, through BOTH the
    avoid-checks skipped on the resumed prefix path AND the
    depth-rate cutoff's dependence on the (history-dependent) match
    depth d.
  * golden sweep: on the real regression ESTs (production
    min-factor-length 15) the two sets happen to coincide — the
    divergence needs repeat structure shorter than min_factor_len — but
    exact output equality on ALL inputs is this framework's contract,
    so seeding stays the sequential host state machine and the batched
    TPU work starts at the (regular) DP stages downstream.

Run: python tools/seeding_evidence.py [--sweep]
"""

import os
import sys
import tarfile
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pintron_tpu.index.gst import SuffixTree, MaximalPairingScanner  # noqa: E402

MIN_TEXT = (b"CCCAAACACCCAACCCCAAACACCACACCCACAACCAAACAAACCCCAACAAAACCAAAC"
            b"ACACACAAAACCCCACAACACCCCACACAAAACAACCACCACCCCCAAACAAAACCAAC"
            b"CCCAAACACCCA")
MIN_PAT = b"CCCAAACACCCA"


def emit_pairings(tree: SuffixTree, pattern: bytes, use_slinks: bool,
                  rate: float, min_len: int):
    """The vertex_scan emission (max-emb-graph.c:217-380 semantics,
    pre-dedup) driven by either the reference's suffix-link walk
    (use_slinks=True) or a fresh per-position root descent."""
    sc = MaximalPairingScanner(tree, pattern)
    t = tree
    out = set()
    for i in range(len(pattern)):
        avoid = sc.prev_symbol
        if use_slinks:
            dst, matched = sc.advance(i)
        else:
            dst, matched = sc._descend(0, i, 0, avoid)
            if dst == -1:
                sc.prev_dst, sc.prev_matched = -1, 0
            else:
                sc.prev_dst, sc.prev_matched = dst, matched
            sc.prev_symbol = pattern[i]
        if dst == -1:
            continue
        d = t.depth[t.parent[dst]] + matched
        min_sd = max(d * rate, min_len)
        node, cur_l, block = dst, d, -1
        while cur_l >= min_sd:
            b_lo = t.lo[block] if block != -1 else t.hi[node]
            b_hi = t.hi[block] if block != -1 else t.hi[node]
            for rng in ((t.lo[node], b_lo), (b_hi, t.hi[node])):
                for j in range(rng[0], rng[1]):
                    tt = int(t.leaf_occ[j])
                    ok = t.text[tt - 1] != avoid if tt > 0 else True
                    if ok:
                        out.add((i, tt, int(cur_l)))
            block = node
            node = int(t.parent[node])
            if node <= 0:
                break
            cur_l = int(t.depth[node])
    return out


def counterexample():
    tree = SuffixTree(MIN_TEXT)
    a = emit_pairings(tree, MIN_PAT, True, 0.2, 2)
    b = emit_pairings(tree, MIN_PAT, False, 0.2, 2)
    return a, b


def golden_sweep(cases=("test-AMBN", "test-788")):
    import pintron_tpu.io.multifasta as mf
    import pintron_tpu.stages.est_fact as ef
    from pintron_tpu.config import Config
    cfg = Config()
    cfg.validate()
    total = diffs = 0
    for case in cases:
        src = tempfile.mkdtemp()
        with tarfile.open(
                os.path.join(REPO, "tests", "golden",
                             f"{case}.tar.gz")) as tf:
            tf.extractall(src)
        gen = mf.read_multifasta(
            open(os.path.join(src, "genomic.txt")))[0]
        mf.parse_genomic_header(gen)
        mf.ntails_removal(gen)
        tree = SuffixTree(gen.seq.encode("latin1"))
        for est in mf.read_multifasta(open(os.path.join(src, "ests.txt"))):
            for ue in ef._unit_for_record(gen, est):
                pat = ue.seq.encode("latin1")
                a = emit_pairings(tree, pat, True,
                                  cfg.min_string_depth_rate,
                                  cfg.min_factor_len)
                b = emit_pairings(tree, pat, False,
                                  cfg.min_string_depth_rate,
                                  cfg.min_factor_len)
                total += 1
                diffs += a != b
    return total, diffs


def main():
    a, b = counterexample()
    extra = sorted(b - a)
    print(f"counterexample: slink-walk set {len(a)} pairings, "
          f"fresh-descent set {len(b)}")
    print(f"  pairings a pure per-position function would emit that the "
          f"reference never does: {extra[:10]}")
    assert extra, "counterexample regressed — walks now agree?!"
    assert not (a - b), "unexpectedly, the slink walk emitted extras"
    if "--sweep" in sys.argv:
        total, diffs = golden_sweep()
        print(f"golden sweep (production min-factor-length): "
              f"{total} patterns, {diffs} set differences")
    print("CONFIRMED: pairing emission is traversal-history dependent")


if __name__ == "__main__":
    main()
