"""MEG construction tests against staged oracle dumps from the reference
implementation (tests/golden/meg-stages-*.txt.gz, produced by a harness
linking the reference's own object files)."""

import gzip
import pathlib

import pytest

from pintron_tpu.config import Config
from pintron_tpu.index.gst import SuffixTree
from pintron_tpu.io import multifasta as mf
from pintron_tpu.meg import graph as megmod
from pintron_tpu.meg import simplify as simp

GOLDEN = pathlib.Path(__file__).parent / "golden"
REF = pathlib.Path("/root/reference/regressionTest")


def load_oracle(case):
    path = GOLDEN / f"meg-stages-{case}.txt.gz"
    if not path.exists():
        pytest.skip(f"no oracle dump for {case}")
    oracle = {}
    flags = {}
    cur_est = -1
    cur_stage = None
    with gzip.open(path, "rt") as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith("@est "):
                cur_est += 1
            elif line.startswith("@stage "):
                cur_stage = line.split()[1]
                oracle[(cur_est, cur_stage)] = ([], [])
            elif line.startswith("V "):
                _, col, p, t, l = line.split()
                oracle[(cur_est, cur_stage)][0].append(
                    (int(col), int(p), int(t), int(l)))
            elif line.startswith("E "):
                _, a, b = line.split()
                oracle[(cur_est, cur_stage)][1].append((int(a), int(b)))
            elif line.startswith("@too_complex_for_compaction "):
                flags[(cur_est, "tcc")] = int(line.split()[1])
            elif line.startswith("@too_complex "):
                flags[(cur_est, "tc")] = int(line.split()[1])
    return oracle, flags, cur_est + 1


def preprocess_case(case):
    gen = mf.read_multifasta(open(REF / case / "genomic.txt"))[0]
    mf.parse_genomic_header(gen)
    mf.ntails_removal(gen)
    ests = mf.read_multifasta(open(REF / case / "ests.txt"))
    out = []
    for est in ests:
        mf.set_est_gb_identification(est)
        mf.set_est_strand_and_rc(est, gen)
        out.append(est)
        mf.polyat_substitution(est)
        if not est.fixed_strand:
            rev = est.copy_and_reverse()
            out.append(rev)
            mf.polyat_substitution(rev)
    return gen, out


def flatten(V):
    verts = []
    ids = {}
    idx = 0
    for col, Vi in enumerate(V):
        for pr in Vi:
            verts.append((col, pr.p, pr.t, pr.l))
            ids[id(pr)] = idx
            idx += 1
    edges = []
    for Vi in V:
        for pr in Vi:
            for a in pr.adjs:
                edges.append((ids[id(pr)], ids[id(a)]))
    return verts, edges


@pytest.mark.parametrize("case", ["test-788", "test-AMBN"])
def test_meg_stages_match_reference(case):
    oracle, flags, n_oracle = load_oracle(case)
    cfg = Config()
    gen, ests = preprocess_case(case)
    assert len(ests) == n_oracle
    gent = gen.seq.encode()
    tree = SuffixTree(gent)
    for k, est in enumerate(ests):
        V = megmod.build_vertex_set(est.seq.encode(), tree, gent, cfg)
        assert flatten(V)[0] == oracle[(k, "vertices")][0], f"EST {k} vertices"
        megmod.build_edge_set(V, cfg)
        assert flatten(V) == oracle[(k, "edges")], f"EST {k} edges"
        simp.simplify_meg(V, cfg)
        assert flatten(V) == oracle[(k, "simplified")], f"EST {k} simplified"
        if cfg.trans_red:
            simp.transitive_reduction(V)
        assert flatten(V) == oracle[(k, "reduced")], f"EST {k} reduced"
        tcc = simp.is_too_complex_for_compaction(V, cfg)
        assert int(tcc) == flags[(k, "tcc")]
        if not tcc and cfg.short_edge_comp:
            simp.compact_short_edges(V, cfg)
        assert flatten(V) == oracle[(k, "compacted")], f"EST {k} compacted"
        assert int(tcc or simp.is_too_complex(V, cfg)) == flags[(k, "tc")]


def test_suffix_tree_brute_force():
    import random

    random.seed(7)

    def node_string(t, v):
        parts = []
        while v != 0:
            parts.append(t.text[t.start[v]:t.end[v]])
            v = t.parent[v]
        return b"".join(reversed(parts))

    for _ in range(60):
        n = random.randint(1, 50)
        txt = bytes(random.choice(b"ACGT") for _ in range(n))
        t = SuffixTree(txt)
        s = t.text
        leaves = {t.leaf_idx[v]: v for v in range(len(t.start))
                  if not t.children[v]}
        assert sorted(leaves) == list(range(len(s)))
        for idx, v in leaves.items():
            assert node_string(t, v) == s[idx:]
            assert t.depth[v] == len(s) - idx
        strings = {node_string(t, v): v for v in range(len(t.start))}
        for v in range(1, len(t.start)):
            if t.children[v]:
                w = node_string(t, v)
                assert t.slink[v] == strings[w[1:]]


def test_log_graphs_dot_dump(tmp_path, monkeypatch):
    """PINTRON_LOG_GRAPHS dumps the 4-stage dot files (LOG_GRAPHS
    rebuild, max-emb-graph.c:711-783)."""
    import os
    import shutil

    import pytest

    ref = "/root/reference/regressionTest/test-AMBN"
    if not os.path.isdir(ref):
        pytest.skip("reference checkout not available")
    monkeypatch.setenv("PINTRON_LOG_GRAPHS", "1")
    monkeypatch.setenv("PINTRON_EST_WORKERS", "1")
    monkeypatch.chdir(tmp_path)
    from pintron_tpu.stages.est_fact import run_est_fact
    for fn in ("genomic.txt", "ests.txt"):
        shutil.copy(os.path.join(ref, fn), tmp_path)
    run_est_fact(str(tmp_path))
    dumped = sorted(p.name for p in tmp_path.glob("meg-*.dot"))
    assert "meg-1-untouched.dot" in dumped
    assert "meg-2-after-basic-simplification.dot" in dumped
    text = (tmp_path / "meg-1-untouched.dot").read_text()
    assert text.startswith("digraph MEG {")
    assert "source" in text and "sink" in text
