"""Stage 6 (maximal-transcripts) byte equality against golden outputs."""

import shutil

import pytest

from pintron_tpu.stages.transcripts import run_maximal_transcripts

CASES = ["test-788", "test-AMBN", "test-CPB2", "test_gtf5"]


@pytest.mark.parametrize("case", CASES)
def test_maximal_transcripts_matches_reference(case, golden, tmp_path):
    gold = golden(case)
    work = tmp_path / case
    work.mkdir()
    for name in ["build-ests.txt", "predicted-introns.txt"]:
        shutil.copy(gold / name, work / name)
    run_maximal_transcripts(str(work))
    for p in range(1, 5):
        for pref in ["TRANSCRIPTS1_", "TEMP_COMPOSITION_TRANS1_"]:
            name = f"{pref}{p}.txt"
            assert (work / name).read_bytes() == (gold / name).read_bytes(), \
                f"{case}/{name} differs"


import os


def _three_exon_case(tmp_path, est_sets, name="tx", n_exons=3):
    """Synthetic multi-exon locus driven through stages 4-5 to produce
    a real build-ests.txt (exon k spans 200*k+1 .. 200*k+100; all
    introns canonical GT..AG).  est_sets lists each EST's exon indices
    (0-based)."""
    import numpy as np

    from pintron_tpu.stages.compact import run_compact_compositions
    from pintron_tpu.stages.intron_agreement import run_intron_agreement

    glen = 200 * n_exons - 100
    rng = np.random.default_rng(71)
    gen = list("".join(rng.choice(list("ACGT"), glen)))
    for k in range(n_exons - 1):
        gen[200 * k + 100:200 * k + 102] = "GT"
        gen[200 * k + 198:200 * k + 200] = "AG"
    gen = "".join(gen)
    exon_bounds = [(200 * k + 1, 200 * k + 100) for k in range(n_exons)]
    work = tmp_path / name
    work.mkdir()
    (work / "genomic.txt").write_text(
        f">chr7:700000:{700000 + glen - 1}:1\n" + gen + "\n")
    oa, pe = [], []
    for k, exset in enumerate(est_sets):
        eid = f"E{k + 1}"
        seq = "".join(gen[s - 1:e] for s, e in
                      (exon_bounds[i] for i in exset))
        rows, pos = [], 0
        for i in exset:
            s, e = exon_bounds[i]
            ln = e - s + 1
            rows.append(f"{pos + 1}\t {pos + ln}\t {s}\t {e}\n")
            pos += ln
        oa.append(f">/gb={eid}/gb={eid}.0/clone_end=3'\n"
                  f"#polya=0\n#polyad=0\n" + "".join(rows))
        pe.append(f">/gb={eid}/gb={eid}.0/clone_end=3'\n{seq}\n")
    (work / "out-agree.txt").write_text("".join(oa))
    (work / "processed-ests.txt").write_text("".join(pe))
    run_intron_agreement(str(work))
    with open(work / "out-after-intron-agree.txt") as fi, \
            open(work / "build-ests.txt", "w") as fo:
        run_compact_compositions(
            fi, fo, str(work / "genomic.txt"),
            str(work / "genomic-exonforCCDS.txt"))
    return work


def _transcript_chains(work):
    """Parse TRANSCRIPTS1_1.txt into per-transcript genomic exon
    coordinate chains."""
    text = (work / "TRANSCRIPTS1_1.txt").read_text()
    chains = []
    for block in text.split(">"):
        if not block.strip():
            continue
        coords = []
        for ln in block.splitlines()[1:]:
            ln = ln.strip()
            if ":" in ln and ln[0].isdigit():
                parts = ln.split(":")
                coords.append((int(parts[0]), int(parts[1])))
        if coords:
            chains.append(coords)
    return chains


def test_overlapping_compositions_extend_to_maximal_chain(tmp_path):
    """E1 = exons 1+2+3 and E2 = exons 2+3+4 share the full 2-3 intron
    chain, so the extension matrix must chain them into ONE maximal
    transcript over all four exons (MaximalTranscripts.c
    Build_Extension_Matrix + Set_Paths).  A single shared EXTERNAL
    exon is deliberately not enough (weak-boundary rule) — that case
    stays separate, which test_incompatible_chains_stay_separate's
    sibling below pins."""
    work = _three_exon_case(tmp_path, [(0, 1, 2), (1, 2, 3)],
                            n_exons=4)
    from pintron_tpu.stages.transcripts import run_maximal_transcripts
    run_maximal_transcripts(str(work))
    chains = _transcript_chains(work)
    assert len(chains) == 1, chains
    assert [(s - 700000 + 1, e - 700000 + 1) for s, e in chains[0]] == \
        [(1, 100), (201, 300), (401, 500), (601, 700)]


def test_single_shared_external_exon_does_not_merge(tmp_path):
    """E1 = exons 1+2 and E2 = exons 2+3 share only exon 2, external in
    both; the weak-boundary rule keeps them as two transcripts."""
    work = _three_exon_case(tmp_path, [(0, 1), (1, 2)], name="tx1b")
    from pintron_tpu.stages.transcripts import run_maximal_transcripts
    run_maximal_transcripts(str(work))
    chains = _transcript_chains(work)
    assert len(chains) == 2, chains


def test_contained_composition_is_absorbed(tmp_path):
    """A composition strictly contained in another (E2 = exon 2 inside
    E1 = exons 1+2+3) must not produce its own transcript
    (Filter_Path_Transcripts containment dedup)."""
    work = _three_exon_case(tmp_path, [(0, 1, 2), (1,)], name="tx2")
    from pintron_tpu.stages.transcripts import run_maximal_transcripts
    run_maximal_transcripts(str(work))
    chains = _transcript_chains(work)
    assert len(chains) == 1, chains
    assert [(s0 - 700000 + 1, e0 - 700000 + 1)
            for s0, e0 in chains[0]] == [(1, 100), (201, 300),
                                         (401, 500)]


def test_incompatible_chains_stay_separate(tmp_path):
    """Exon-skipping variants (1+2+3 vs 1+3) have incompatible intron
    chains and must remain two distinct maximal transcripts."""
    work = _three_exon_case(tmp_path, [(0, 1, 2), (0, 2)], name="tx3")
    from pintron_tpu.stages.transcripts import run_maximal_transcripts
    run_maximal_transcripts(str(work))
    chains = _transcript_chains(work)
    assert len(chains) == 2, chains
    assert sorted(len(c) for c in chains) == [2, 3]
