"""True multi-process jax.distributed validation: 2 processes x 4 virtual
CPU devices form one 8-device global (data=4, model=2) mesh serving a
quantized store with per-process data feeding — the full multi-host stack
minus real ICI."""

import json
import os
import socket
import subprocess
import sys
import tempfile

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.timeout(600)
def test_two_process_distributed_inference():
    d = tempfile.mkdtemp()
    env_base = dict(os.environ, DLQ_PLATFORM="cpu", DLQ_CPU_DEVICES="4")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(cmd, env):
        r = subprocess.run([sys.executable] + cmd, capture_output=True, text=True,
                           env=env, cwd=root, timeout=300)
        assert r.returncode == 0, r.stderr[-800:]
        return r.stdout

    run(["tools/export_weights.py", "--model", "resnet18", "--out", f"{d}/r18",
         "--num_classes", "10", "--small_input"], env_base)
    run(["tools/quantize_model.py", "--manifest", f"{d}/r18", "--out", f"{d}/q",
         "--scheme", "int8_pc", "--batch", "4", "--calib_batches", "1"], env_base)

    port = _free_port()
    procs = []
    for i in range(2):
        env = dict(env_base,
                   JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(i))
        procs.append(subprocess.Popen(
            [sys.executable, "tools/launch_distributed.py", "--qmanifest", f"{d}/q",
             "--model_parallel", "2", "--per_host_batch", "8", "--steps", "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=root))
    outs = [p.communicate(timeout=300) for p in procs]
    for p in procs:
        assert p.returncode == 0, outs[procs.index(p)][1][-800:]
    report = json.loads([l for l in outs[0][0].splitlines() if l.startswith("{")][-1])
    assert report["hosts"] == 2
    assert report["devices"] == 8
    assert report["mesh"] == {"data": 4, "model": 2}
    assert report["img_per_s"] > 0
