"""Chip-owning device service (pintron_tpu/devservice.py): protocol
round trips, cross-request batch merging, result equality with the
in-process path, and clean shutdown with stats."""

import os
import subprocess
import sys
import tempfile
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def service():
    sock = os.path.join(tempfile.mkdtemp(prefix="svc-test-"), "dev.sock")
    ready = sock + ".ready"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "-m", "pintron_tpu.devservice",
         "--socket", sock, "--ready-file", ready], env=env)
    t0 = time.monotonic()
    while not os.path.exists(ready):
        if proc.poll() is not None or time.monotonic() - t0 > 90:
            pytest.skip("device service failed to start")
        time.sleep(0.05)
    yield sock
    from multiprocessing.connection import Client

    from pintron_tpu.devservice import AUTHKEY
    try:
        conn = Client(sock, family="AF_UNIX", authkey=AUTHKEY)
        conn.send(("shutdown", None))
        stats = conn.recv()[1]
        conn.close()
        assert stats["requests"] > 0
        # the error-path test deliberately sends one bad op
        assert stats["errors"] <= 1
    finally:
        proc.wait(timeout=15)


def _problems(seed=5, n=60):
    rng = np.random.default_rng(seed)
    alpha = np.array(list("ACGT"))
    out = []
    for _ in range(n):
        ln = int(rng.integers(5, 180))
        g = "".join(rng.choice(alpha, ln)).encode()
        e = bytearray(g)
        for _ in range(int(rng.integers(0, 6))):
            e[int(rng.integers(0, ln))] = ord(str(rng.choice(alpha)))
        out.append((g, bytes(e), int(rng.integers(0, 8))))
    return out


def _with_service(sock):
    import pintron_tpu.ops.offload as off
    os.environ["PINTRON_DEVICE_SERVICE"] = sock
    off._SERVICE_CONN = None
    off._SERVICE_LOCK = None


def _without_service():
    import pintron_tpu.ops.offload as off
    os.environ.pop("PINTRON_DEVICE_SERVICE", None)
    off._SERVICE_CONN = None
    off._SERVICE_LOCK = None


def test_kband_and_edit_via_service_match_local(service):
    import pintron_tpu.ops.offload as off
    problems = _problems()
    pairs = [(g[:20], e[:20]) for g, e, _ in problems]
    try:
        _with_service(service)
        ok_s = off.eval_kband(problems)
        ed_s = off.eval_edit_batch(pairs)
    finally:
        _without_service()
    ok_l = off.eval_kband(problems)
    ed_l = off.eval_edit_batch(pairs)
    assert np.array_equal(ok_s, ok_l)
    assert np.array_equal(ed_s, ed_l)


def test_rb_via_service_matches_local(service):
    import pintron_tpu.ops.offload as off
    rng = np.random.default_rng(9)
    alpha = np.array(list("ACGT"))
    probs = []
    for _ in range(20):
        lt = int(rng.integers(4, 120))
        lp = int(rng.integers(1, 60))
        probs.append(("".join(rng.choice(alpha, lt)).encode(),
                      "".join(rng.choice(alpha, lp)).encode()))
    try:
        _with_service(service)
        vs, ps = off.eval_rb(probs)
    finally:
        _without_service()
    vl, pl = off.eval_rb(probs)
    # strides may differ (service trims to the payload's own stride)
    w = min(vs.shape[1], vl.shape[1])
    assert np.array_equal(vs[:, :w], vl[:, :w])
    assert np.array_equal(ps[:, :w], pl[:, :w])
    # and the tables must equal the host DP's per-row minima
    from pintron_tpu.factorize.alignments import edit_distance_full
    for i, (t, p) in enumerate(probs[:6]):
        M = edit_distance_full(t.decode("latin1"), p.decode("latin1"))
        for r in range(len(p) + 1):
            assert vl[i, r] == M[r].min()
            assert pl[i, r] == int(np.argmax(M[r] == M[r].min()))


def test_service_error_degrades_not_crashes(service):
    """An unknown op must come back as an error reply the client turns
    into a host fallback (wedge), never a worker crash."""
    from multiprocessing.connection import Client

    from pintron_tpu.devservice import AUTHKEY
    conn = Client(service, family="AF_UNIX", authkey=AUTHKEY)
    conn.send(("no-such-op", None))
    status, msg = conn.recv()
    conn.close()
    assert status == "err"
    assert "no-such-op" in msg
