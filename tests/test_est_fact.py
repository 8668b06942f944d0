"""End-to-end est-fact stage equality against golden reference outputs."""

import pathlib
import shutil

import pytest

from pintron_tpu.stages.est_fact import run_est_fact

REF = pathlib.Path("/root/reference/regressionTest")

CHECK_FILES = ["raw-multifasta-out.txt", "processed-ests.txt", "megs.txt",
               "processed-megs.txt", "meg-edges.txt"]


@pytest.mark.parametrize("case", ["test-788", "test-AMBN", "test-CPB2",
                                  "test-mattia1", "test_gtf3",
                                  "test-TP53"])
def test_est_fact_stage_matches_reference(case, golden, tmp_path):
    gold = golden(case)
    work = tmp_path / case
    work.mkdir()
    for fn in ("genomic.txt", "ests.txt"):
        src_path = gold / fn
        if not src_path.exists():
            src_path = REF / case / fn
        shutil.copy(src_path, work / fn)
    run_est_fact(str(work))
    checked = 0
    for name in CHECK_FILES:
        if not (gold / name).exists():
            continue  # some golden tarballs keep only the final outputs
        produced = (work / name).read_bytes()
        expected = (gold / name).read_bytes()
        assert produced == expected, f"{case}/{name} differs"
        checked += 1
    assert checked > 0


def test_straggler_reshards_without_changing_bytes(golden):
    """Elasticity: with dynamic record claiming, a slow worker's share is
    re-sharded onto the others and the stage output stays byte-identical
    (the SURVEY §2.5 straggler/re-shard requirement)."""
    import os
    import shutil

    import pintron_tpu.stages.est_fact as ef

    import pathlib
    case = golden("test_gtf6")
    ref = pathlib.Path("/root/reference/regressionTest/test_gtf6")
    for fn in ("genomic.txt", "ests.txt"):
        if not (case / fn).exists():
            if not (ref / fn).exists():
                import pytest
                pytest.skip("no inputs available")
            shutil.copy(ref / fn, case / fn)

    def fresh_pool_run(workdir, straggle=None):
        # the pool forks at creation and inherits module state, so the
        # straggler hook must be set before a fresh pool starts
        if ef._POOL is not None:
            ef._POOL.shutdown()
            ef._POOL = None
        os.environ["PINTRON_EST_WORKERS"] = "2"
        ef._TEST_STRAGGLER_S = float(straggle) if straggle else None
        try:
            ef.run_est_fact(str(workdir))
        finally:
            del os.environ["PINTRON_EST_WORKERS"]
            ef._TEST_STRAGGLER_S = None
            if ef._POOL is not None:
                ef._POOL.shutdown()
                ef._POOL = None

    names = ("raw-multifasta-out.txt", "processed-ests.txt", "megs.txt",
             "processed-megs.txt", "meg-edges.txt")
    outs = {}
    for tag, straggle in (("base", None), ("strag", "0.4")):
        work = case.parent / f"straggler-{tag}"
        work.mkdir(exist_ok=True)
        for fn in ("genomic.txt", "ests.txt"):
            shutil.copy(case / fn, work / fn)
        fresh_pool_run(work, straggle)
        outs[tag] = {n: (work / n).read_bytes() for n in names}
    for n in names:
        assert outs["base"][n] == outs["strag"][n], \
            f"{n} changed under a straggling worker"
    # and both match golden where golden ships the artifact
    for n in names:
        gp = case / n
        if gp.exists():
            assert outs["base"][n] == gp.read_bytes(), f"{n} vs golden"
