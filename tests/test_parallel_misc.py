"""init_distributed bootstrap behavior: single-host no-op + a real
two-process DCN dryrun (VERDICT r2 #8 — the multi-host bootstrap tested
beyond the no-op, SURVEY §2.10 communication-backend row)."""

import os
import subprocess
import sys

from longcat_video_tta_tpu.parallel.mesh import init_distributed


def test_init_distributed_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert init_distributed() is False


def test_two_process_dcn_sharded_step():
    """Spawn 2 localhost processes through init_distributed (gloo CPU
    collectives), build a global (data,) mesh over 2x2 virtual devices,
    and run one sharded video-parallel TTA step end to end."""
    worker = os.path.join(os.path.dirname(__file__), "dcn_worker.py")
    port = str(29600 + (os.getpid() % 200))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "OK" in out, out
