"""Mesh sharding invariance: the sharded step must produce bit-identical
results on a 1-device mesh and an 8-device ("data" x "seq") mesh — the
SURVEY §2.5 requirement that N hosts reproduce 1-chip outputs exactly
(sorted/deterministic collective merges)."""

import numpy as np

from pintron_tpu.parallel.mesh import (example_batch, make_mesh,
                                       sharded_alignment_step)


def _run(mesh, args, denom, n_introns, max_rows, k_max):
    step = sharded_alignment_step(mesh, n_introns, max_rows=max_rows,
                                  k_max=k_max, denominator=denom)
    return [np.asarray(x) for x in step(*args)]


def test_device_count_invariance():
    import jax

    assert len(jax.devices()) >= 8, "conftest forces 8 virtual devices"
    max_rows, k_max, n_introns = 96, 8, 16
    args, denom = example_batch(batch=32, n_max=128, m_max=max_rows,
                                k_max=k_max, n_introns=n_introns,
                                locus_len=512)

    single = _run(make_mesh(1, 1, devices=jax.devices()[:1]), args, denom,
                  n_introns, max_rows, k_max)
    multi = _run(make_mesh(4, 2), args, denom, n_introns, max_rows, k_max)

    names = ["dist", "scores", "support", "hist"]
    for name, a, b in zip(names, single, multi):
        assert a.dtype == b.dtype
        if a.dtype.kind == "f":
            # PWM scores are float32 reductions with a fixed contraction
            # order per problem; sharding does not change per-problem
            # math, so these too must match exactly
            assert np.array_equal(a, b), name
        else:
            assert np.array_equal(a, b), name


def test_mesh_kband_real_data_invariance(golden):
    """REAL pipeline data over the mesh: the production K-band batch
    collected from the AMBN golden case must produce bit-identical
    verdicts sharded over 8 devices vs single-device, and the stage-2
    artifacts must stay byte-identical to golden."""
    import os
    import shutil

    import pintron_tpu.ops.offload as off
    from pintron_tpu.native import get_lib
    from pintron_tpu.stages.est_fact import run_est_fact

    if get_lib() is None or not hasattr(get_lib(), "est_collect_noisy"):
        import pytest
        pytest.skip("native collect entry unavailable")

    case = golden("test-AMBN")
    work = case.parent / "mesh-work"
    work.mkdir(exist_ok=True)
    for fn in ("genomic.txt", "ests.txt"):
        shutil.copy(case / fn, work / fn)

    captured = []
    orig = off.eval_kband

    def capture(problems):
        captured.append(list(problems))
        return orig(problems)

    off.eval_kband = capture
    off.KBAND_SELF_TUNED_OFF = False   # order-independence vs the tuner
    os.environ["PINTRON_DEVICE"] = "1"
    os.environ["PINTRON_DEVICE_KBAND"] = "1"
    os.environ["PINTRON_DEVICE_MESH"] = "8"
    # wipe the persistent memo: an earlier test may have already run
    # this locus, which would leave nothing to collect for the device
    os.environ["PINTRON_FRESH_MEMO"] = "1"
    try:
        run_est_fact(str(work))
    finally:
        off.eval_kband = orig
        del os.environ["PINTRON_DEVICE"]
        del os.environ["PINTRON_DEVICE_KBAND"]
        del os.environ["PINTRON_DEVICE_MESH"]
        del os.environ["PINTRON_FRESH_MEMO"]

    assert captured and any(captured), "no real problems reached device"
    for name in ("raw-multifasta-out.txt", "processed-ests.txt",
                 "megs.txt", "meg-edges.txt"):
        assert (case / name).read_bytes() == (work / name).read_bytes(), \
            f"{name} differs under the 8-device mesh"

    # problem-level bit-equality: mesh vs single-device on the captured
    # real batch
    problems = [p for batch in captured for p in batch]
    os.environ["PINTRON_DEVICE_MESH"] = "8"
    try:
        ok_mesh = orig(problems)
    finally:
        del os.environ["PINTRON_DEVICE_MESH"]
    ok_single = orig(problems)
    assert np.array_equal(ok_mesh, ok_single)


def test_multiprocess_est_fact_byte_identical(golden, tmp_path):
    """Two OS processes (jax.distributed over Gloo, disjoint EST
    shards, one global all-reduce, deterministic merge) must reproduce
    the single-process stage-2 artifacts byte-for-byte — the multi-host
    execution pattern actually run, not argued by analogy."""
    import shutil

    from pintron_tpu.parallel.multihost import run_est_fact_multiprocess

    case = golden("test-788")
    work = tmp_path / "mh"
    work.mkdir()
    for fn in ("genomic.txt", "ests.txt"):
        shutil.copy(case / fn, work / fn)
    report = run_est_fact_multiprocess(str(work), 2)
    assert report["nprocs"] == 2
    assert len(report["ranks"]) == 2
    # every rank observed the same all-reduced global counts
    for r in report["ranks"]:
        assert r["global_counts"] == report["global_counts"]
        assert r["n_global_devices"] >= 2
    assert sum(r["units"] for r in report["ranks"]) > 0
    for name in ("raw-multifasta-out.txt", "processed-ests.txt",
                 "megs.txt", "processed-megs.txt", "meg-edges.txt"):
        gp = case / name
        if not gp.exists():
            continue
        assert gp.read_bytes() == (work / name).read_bytes(), \
            f"{name} differs in the 2-process distributed run"


def test_multihost_host_mode_byte_identical(golden, tmp_path):
    """The JAX-free scaling mode (collective=False: native host-path
    workers attaching the shared mmap index) must also reproduce the
    stage-2 artifacts byte-for-byte at any N."""
    import shutil

    from pintron_tpu.parallel.multihost import run_est_fact_multiprocess

    case = golden("test-788")
    work = tmp_path / "mhh"
    work.mkdir()
    for fn in ("genomic.txt", "ests.txt"):
        shutil.copy(case / fn, work / fn)
    report = run_est_fact_multiprocess(str(work), 2, collective=False)
    assert report["collective"] is False
    assert len(report["ranks"]) == 2
    for name in ("raw-multifasta-out.txt", "processed-ests.txt",
                 "megs.txt", "processed-megs.txt", "meg-edges.txt"):
        gp = case / name
        if not gp.exists():
            continue
        assert gp.read_bytes() == (work / name).read_bytes(), name


def test_suffix_tree_save_load_roundtrip(tmp_path):
    """SuffixTree.save/load (the shared-memory index attach) must
    reproduce every flat array, the leaf indexes and the text exactly —
    the vertex scan reads full-capacity slices, so the serialized
    layout must match the build layout bit for bit."""
    import numpy as np

    from pintron_tpu.index.gst import SuffixTree

    rng = np.random.default_rng(11)
    for _ in range(3):
        n = int(rng.integers(100, 4000))
        text = bytes(rng.choice(list(b"ACGTN"), n))
        t1 = SuffixTree(text)
        prefix = str(tmp_path / "idx")
        t1.save(prefix)
        t2 = SuffixTree.load(prefix)
        assert t2.text == t1.text
        f1, f2 = t1.flat_arrays(), t2.flat_arrays()
        for k in ("start", "end", "parent", "slink", "depth", "single",
                  "lo", "hi", "occ", "coff", "cchar", "cnode"):
            assert np.array_equal(np.asarray(f1[k]), np.asarray(f2[k])), k
        assert np.array_equal(np.asarray(t1.leaf_idx),
                              np.asarray(t2.leaf_idx))
