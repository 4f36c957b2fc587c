"""Multi-host entry point smoke (BASELINE.md ">= 2 hosts" scaling row).

Spawns 2 OS processes, each with 4 virtual CPU devices, that initialize the
JAX distributed runtime and run one scenario-sharded PI-ADMM step
collectively over the 8 global devices (``tools/multihost_smoke.py``).
"""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_step():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)            # smoke script sets its own count
    env["JAX_PLATFORMS"] = "cpu"
    script = os.path.join(REPO, "tools", "multihost_smoke.py")
    procs = [subprocess.Popen(
        [sys.executable, script, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=570)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK process={i}/2" in out, out[-3000:]
        # the consensus-SPMD flagship step also ran collectively and each
        # process's shards matched its locally-computed single-device
        # reference (VERDICT r3 next #5)
        assert f"MULTIHOST_CONSENSUS_OK process={i}/2" in out, out[-3000:]
