"""The candidate indexes in stages 4/6 must be output-identical to the
plain O(n^2) scans they replace (kill switches PINTRON_NO_GI_INDEX /
PINTRON_NO_TX_INDEX select the legacy paths)."""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

RUNNER = r"""
import sys
sys.path.insert(0, {repo!r})
from pintron_tpu.stages.intron_agreement import run_intron_agreement
from pintron_tpu.stages.transcripts import run_maximal_transcripts
from pintron_tpu.stages.compact import run_compact_compositions
w = {work!r}
run_intron_agreement(w)
with open(w + "/out-after-intron-agree.txt") as fin, \
        open(w + "/build-ests.txt", "w") as fout:
    run_compact_compositions(fin, fout, w + "/genomic.txt",
                             w + "/genomic-exonforCCDS.txt")
run_maximal_transcripts(w)
"""

CHECK = ["out-after-intron-agree.txt", "predicted-introns.txt",
         "TRANSCRIPTS1_1.txt", "TRANSCRIPTS1_2.txt",
         "TEMP_COMPOSITION_TRANS1_1.txt"]


@pytest.mark.parametrize("case", ["test-788", "test-TP53"])
def test_stage46_index_matches_legacy_scan(case, golden, tmp_path):
    gold = golden(case)
    need = ["genomic.txt", "processed-ests.txt", "out-agree.txt"]
    if not all((gold / f).exists() for f in need):
        pytest.skip("golden tarball lacks stage inputs")
    outs = {}
    for mode, env_extra in (("indexed", {}),
                            ("legacy", {"PINTRON_NO_GI_INDEX": "1",
                                        "PINTRON_NO_TX_INDEX": "1"})):
        work = tmp_path / mode
        work.mkdir()
        for f in need:
            (work / f).write_bytes((gold / f).read_bytes())
        env = dict(os.environ)
        env.pop("PINTRON_NO_GI_INDEX", None)
        env.pop("PINTRON_NO_TX_INDEX", None)
        env.update(env_extra)
        r = subprocess.run(
            [sys.executable, "-c",
             RUNNER.format(repo=str(REPO), work=str(work))],
            env=env, capture_output=True, timeout=600)
        assert r.returncode == 0, r.stderr.decode()[-2000:]
        outs[mode] = {f: (work / f).read_bytes() for f in CHECK
                      if (work / f).exists()}
    assert outs["indexed"].keys() == outs["legacy"].keys()
    for f in outs["indexed"]:
        assert outs["indexed"][f] == outs["legacy"][f], f"{f} differs"


def test_seeding_traversal_history_counterexample():
    """Pin the DESIGN.md counterexample: the reference's suffix-link walk
    emits a pairing set that a pure per-position (k-mer-style) seeding
    cannot reproduce — the fresh-descent set strictly contains it on a
    low-complexity repeat locus (see tools/seeding_evidence.py)."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "seeding_evidence",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "seeding_evidence.py"))
    se = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(se)
    slink, fresh = se.counterexample()
    assert fresh - slink, "counterexample regressed: walks now agree"
    assert not (slink - fresh)
    assert (1, 0, 2) in fresh - slink
