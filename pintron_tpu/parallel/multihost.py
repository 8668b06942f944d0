"""Multi-process est-fact: the multi-host execution pattern, for real.

The reference is strictly single-host; its only cross-"node" channel is
files on disk (SURVEY §2.5).  This module runs est-fact as N separate
OS processes — the multi-host shape — with the three elements a real
multi-host deployment needs, each actually executed (not argued by
analogy to the fork pool):

  * **disjoint sharding**: process r owns EST units r, r+N, r+2N, ...
    (the per-EST independence axis, main-est-fact.c:249-291) and runs
    the full device flow over its shard;
  * **a global collective**: after alignment, every process joins a
    ``jax.distributed`` cluster (Gloo over TCP — the DCN stand-in on a
    CPU platform; ICI collectives on real pods), forms one global Mesh
    over all processes' devices, and all-reduces its shard's
    problem/verdict counts — every rank must observe identical global
    sums, certifying the cross-process collective path end-to-end;
  * **a deterministic merge**: the parent reassembles the per-unit
    output blobs in unit order, which is exactly the reference's file
    ABI — stage-2 artifacts must come out byte-identical to the
    single-process run for ANY N.

CLI (parent): python -m pintron_tpu.parallel.multihost <workdir> [N]
"""

from __future__ import annotations

import json
import os
import pickle
import socket
import subprocess
import sys
import tempfile
import time

NAMES = ("raw-multifasta-out.txt", "megs.txt", "processed-megs.txt",
         "processed-megs-info.txt", "processed-ests.txt",
         "meg-edges.txt")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _shard_blobs(workdir: str, shard):
    """Run the est-fact device flow over one EST shard; returns
    ([(unit_idx, six_blobs)], stats dict).  Mirrors run_est_fact's
    setup (config + genomic preprocessing + suffix tree)."""
    from pintron_tpu.config import Config
    from pintron_tpu.index.gst import SuffixTree
    from pintron_tpu.io import multifasta as mf
    from pintron_tpu.stages.est_fact import _run_units_device

    ini = os.path.join(workdir, "config.ini")
    config = Config.from_ini(ini) if os.path.exists(ini) else Config()
    config.validate()
    with open(os.path.join(workdir, "genomic.txt")) as f:
        gen = mf.read_multifasta(f)[0]
    mf.parse_genomic_header(gen)
    mf.ntails_removal(gen)
    gen_seq_bytes = gen.seq.encode("latin1")
    tree = SuffixTree(gen_seq_bytes)
    dev = _run_units_device(gen, tree, gen_seq_bytes, config,
                            os.path.join(workdir, "ests.txt"),
                            fresh=True, shard=shard)
    if dev is None:
        raise RuntimeError("device flow unavailable in shard worker")
    import pintron_tpu.ops.offload as off
    return dev, dict(off.STATS)


def child_main(argv) -> int:
    rank = int(argv[0])
    nprocs = int(argv[1])
    port = argv[2]
    workdir = argv[3]
    out_path = argv[4]

    import jax
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs, process_id=rank)

    blobs, stats = _shard_blobs(workdir, (rank, nprocs))

    # the cross-process collective: all-reduce this shard's counts over
    # a global mesh spanning every process's devices
    import numpy as np

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    devs = jax.devices()
    local = jax.local_devices()
    mesh = Mesh(np.array(devs), ("data",))
    counts = np.zeros((len(local), 2), dtype=np.int64)
    counts[0, 0] = stats.get("problems", 0)
    counts[0, 1] = stats.get("device_problems", 0)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), counts)
    gsum = jax.jit(lambda x: jnp.sum(x, axis=0))(garr)
    global_counts = [int(v) for v in np.asarray(gsum)]

    with open(out_path, "wb") as f:
        pickle.dump({"rank": rank,
                     "n_global_devices": len(devs),
                     "n_local_devices": len(local),
                     "blobs": blobs,
                     "local_problems": int(counts[0, 0]),
                     "global_counts": global_counts}, f)
    return 0


def run_est_fact_multiprocess(workdir: str, nprocs: int,
                              local_devices: int = 1,
                              timeout: float = 900.0) -> dict:
    """Spawn nprocs distributed workers over disjoint EST shards, merge
    their stage-2 artifacts deterministically into ``workdir``, and
    return a report (per-rank stats + the all-reduced global counts,
    which every rank must agree on)."""
    port = _free_port()
    outdir = tempfile.mkdtemp(prefix="pintron-mh-")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count="
                          f"{local_devices}").strip()
    # a clean PYTHONPATH drops any accelerator-tunnel sitecustomize so
    # the children really come up on the CPU platform
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    procs = []
    outs = []
    for r in range(nprocs):
        out_path = os.path.join(outdir, f"rank{r}.pkl")
        outs.append(out_path)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "pintron_tpu.parallel.multihost",
             "--child", str(r), str(nprocs), str(port), workdir,
             out_path],
            env=env))
    deadline = time.monotonic() + timeout
    for p in procs:
        left = max(1.0, deadline - time.monotonic())
        try:
            rc = p.wait(timeout=left)
        except subprocess.TimeoutExpired:
            for q in procs:
                if q.poll() is None:
                    q.kill()
            raise RuntimeError("multihost worker timed out")
        if rc != 0:
            for q in procs:
                if q.poll() is None:
                    q.kill()
            raise RuntimeError(f"multihost worker exited rc={rc}")

    merged = {}
    report = {"nprocs": nprocs, "ranks": []}
    globals_seen = set()
    for out_path in outs:
        with open(out_path, "rb") as f:
            d = pickle.load(f)
        for i, blobs in d["blobs"]:
            merged[i] = blobs
        report["ranks"].append(
            {"rank": d["rank"], "units": len(d["blobs"]),
             "local_problems": d["local_problems"],
             "global_counts": d["global_counts"],
             "n_global_devices": d["n_global_devices"]})
        globals_seen.add(tuple(d["global_counts"]))
    if len(globals_seen) != 1:
        raise AssertionError(
            f"ranks disagree on the all-reduced counts: {globals_seen}")
    report["global_counts"] = list(globals_seen.pop())

    ordered = [merged[i] for i in sorted(merged)]
    from pintron_tpu.utils import write_text
    for k, name in enumerate(NAMES):
        write_text(os.path.join(workdir, name),
                   "".join(b[k] for b in ordered))
    return report


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if argv and argv[0] == "--child":
        return child_main(argv[1:])
    if not argv:
        print("usage: multihost <workdir> [nprocs]")
        return 2
    workdir = argv[0]
    nprocs = int(argv[1]) if len(argv) > 1 else 2
    report = run_est_fact_multiprocess(workdir, nprocs)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
