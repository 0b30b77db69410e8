"""Two-process multi-HOST test on the CPU backend (round-3, VERDICT #10).

SURVEY §4 recommends multi-host tests beyond the 8-fake-device single
process suite: here TWO OS processes (playing two hosts), each with 4
fake CPU devices, join one ``jax.distributed`` runtime through
``parallel.mesh.init_distributed``, build the global (batch=4, cols=2)
mesh with ``make_multihost_mesh``, and run one batched sharded solve —
the batch axis crossing the process (DCN) boundary.  The reference is
strictly single-process (SURVEY §2.3); this pins the new capability.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_batched_solve():
    port = _free_port()
    env = dict(os.environ)
    # Each worker sets its own XLA_FLAGS/backend; scrub any fake-device
    # setting the pytest process itself runs under.
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for rank in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=540)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for rank, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"rank {rank} failed (rc={rc}):\n{err[-3000:]}"
        assert f"MULTIHOST_OK rank={rank}" in out, out
    # Both ranks must agree on every objective (same global computation).
    line0 = [l for l in outs[0][1].splitlines() if "MULTIHOST_OK" in l][0]
    line1 = [l for l in outs[1][1].splitlines() if "MULTIHOST_OK" in l][0]
    assert line0.split("objs")[1] == line1.split("objs")[1]
