"""Execute the multi-process pod runtime for real (VERDICT r2 item 4).

Spawns TWO OS processes that form a jax.distributed cluster over CPU
(gloo collectives, 4 virtual devices each), build the hosts-outermost
pod_mesh, feed per-process client shards through
multihost.host_client_array — executing the
jax.make_array_from_process_local_data branch and a cross-process
psum-fused weighted sum — and verify against a numpy recomputation.

This is the testable core of the reference-replacing pod runtime: the
reference simulates all parties in one process (benchmark.py:459-461);
here the client axis genuinely spans OS processes.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "_mp_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_pod_runtime():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "MP_TEST_PORT": str(port),
            "MP_TEST_PROC": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            # Belt and braces: the sitecustomize overrides JAX_PLATFORMS,
            # but the child also forces CPU via jax.config.
            "JAX_PLATFORMS": "cpu",
            # The child script lives in tests/; the package import root is
            # the repo.
            "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, CHILD], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for pp in procs:
                pp.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"proc{pid}: psum-fused weighted sum over 2 processes" in out, \
            out
