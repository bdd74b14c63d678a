"""init_distributed bootstrap behavior (single-host no-op)."""

from longcat_video_tta_tpu.parallel.mesh import init_distributed


def test_init_distributed_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert init_distributed() is False
