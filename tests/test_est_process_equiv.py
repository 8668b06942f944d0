"""Equivalence fuzz: the fused native per-EST flow (est_process) must
produce the same stage-2 outputs as the host-side cascade it replaced
(the round-1 path, which itself is byte-validated against the reference
on the regression suite)."""

import os
import random
import subprocess
import sys
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

RUNNER = r"""
import os, sys
sys.path.insert(0, {repo!r})
from pintron_tpu.stages.est_fact import run_est_fact
run_est_fact({work!r})
"""

CHECK_FILES = ["raw-multifasta-out.txt", "processed-ests.txt", "megs.txt",
               "processed-megs.txt", "meg-edges.txt",
               "processed-megs-info.txt"]


def _mutate(rng, s, n_sub, n_del, n_ins):
    s = list(s)
    for _ in range(n_sub):
        i = rng.randrange(len(s))
        s[i] = rng.choice("ACGT")
    for _ in range(n_del):
        if len(s) > 2:
            del s[rng.randrange(len(s))]
    for _ in range(n_ins):
        s.insert(rng.randrange(len(s)), rng.choice("ACGT"))
    return "".join(s)


def _make_case(tmpdir, seed):
    """A small random locus with spliced ESTs: random exon/intron
    structure, sequencing noise, polyA tails, N runs."""
    rng = random.Random(seed)
    glen = rng.randrange(3000, 9000)
    gen = "".join(rng.choice("ACGT") for _ in range(glen))
    # plant canonical splice sites around a few introns
    ests = []
    for e in range(8):
        n_exons = rng.randrange(1, 5)
        pos = rng.randrange(0, glen // 3)
        parts = []
        for x in range(n_exons):
            elen = rng.randrange(30, 260)
            if pos + elen >= glen:
                break
            parts.append(gen[pos:pos + elen])
            pos += elen
            ilen = rng.randrange(50, 400)
            pos += ilen
            if pos >= glen:
                break
        if not parts:
            continue
        seq = "".join(parts)
        seq = _mutate(rng, seq, n_sub=rng.randrange(0, 4),
                      n_del=rng.randrange(0, 2), n_ins=rng.randrange(0, 2))
        if rng.random() < 0.4:
            seq = seq + "A" * rng.randrange(8, 30)
        if rng.random() < 0.2:
            seq = "N" * rng.randrange(1, 6) + seq
        ests.append((f"EST{seed}_{e}", seq))
    with open(os.path.join(tmpdir, "genomic.txt"), "w") as f:
        f.write(f">chr1:1000:{1000 + glen - 1}:+1\n{gen}\n")
    with open(os.path.join(tmpdir, "ests.txt"), "w") as f:
        for name, seq in ests:
            f.write(f">gi|{name}| /gb={name}\n{seq}\n")
    return len(ests)


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_native_est_process_matches_host_path(tmp_path, seed):
    made = _make_case(str(tmp_path), seed)
    if made == 0:
        pytest.skip("empty random case")
    outs = {}
    # four rungs of the ladder: the whole-run native call (worker_run:
    # C-side FASTA parse + preprocessing + all units), the fused
    # per-unit native call (unit_process), the per-EST native call
    # (est_process) with Python driver glue, and the pure host cascade
    for mode, env_extra in (("native", {}),
                            ("unit", {"PINTRON_NO_NATIVE_WORKER": "1"}),
                            ("estproc", {"PINTRON_NO_NATIVE_UNIT": "1"}),
                            ("host", {"PINTRON_NO_NATIVE_EST_PROCESS": "1"})):
        work = tmp_path / mode
        work.mkdir()
        for fn in ("genomic.txt", "ests.txt"):
            (work / fn).write_bytes((tmp_path / fn).read_bytes())
        env = dict(os.environ)
        env.pop("PINTRON_NO_NATIVE_EST_PROCESS", None)
        env.pop("PINTRON_NO_NATIVE_UNIT", None)
        env.pop("PINTRON_NO_NATIVE_WORKER", None)
        env.update(env_extra)
        env["PINTRON_EST_WORKERS"] = "1"
        r = subprocess.run(
            [sys.executable, "-c",
             RUNNER.format(repo=str(REPO), work=str(work))],
            env=env, capture_output=True, timeout=600)
        assert r.returncode == 0, r.stderr.decode()[-2000:]
        outs[mode] = {fn: (work / fn).read_bytes() for fn in CHECK_FILES}
    for other in ("unit", "estproc", "host"):
        for fn in CHECK_FILES:
            if fn == "processed-megs-info.txt":
                # timing values differ; compare only structure (line count
                # + factorization counts)
                a = [l.split()[2:] for l in
                     outs["native"][fn].decode().splitlines()]
                b = [l.split()[2:] for l in
                     outs[other][fn].decode().splitlines()]
                assert a == b, \
                    f"{fn} structure differs (seed {seed}, vs {other})"
            else:
                assert outs["native"][fn] == outs[other][fn], \
                    f"{fn} differs (seed {seed}, vs {other})"
