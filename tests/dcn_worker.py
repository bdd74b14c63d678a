"""Worker process for the two-process DCN dryrun test
(tests/test_parallel_misc.py::test_two_process_dcn_sharded_step).

Each process contributes 2 virtual CPU devices; the pair bootstraps
through parallel.mesh.init_distributed (the analogue of the reference's
NCCL process-group init, run_baseline.py:55-79) with gloo CPU
collectives, builds a global (data,) mesh over all 4 devices, and runs
ONE video-parallel TTA train step sharded across processes.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from longcat_video_tta_tpu.parallel.mesh import init_distributed

assert init_distributed(f"127.0.0.1:{port}", 2, pid)

import numpy as np

import jax.numpy as jnp
from jax.sharding import Mesh

from longcat_video_tta_tpu.config import AdapterConfig, OptimConfig, \
    longcat_tiny
from longcat_video_tta_tpu.models.dit import init_dit
from longcat_video_tta_tpu.tta import build_optimizer, build_scheme, \
    split_tta_latents
from longcat_video_tta_tpu.tta.engine import make_batched_train_chunk

cfg = longcat_tiny().dit
devs = jax.devices()
assert len(devs) == 4, f"expected 4 global devices, got {len(devs)}"
mesh = Mesh(np.asarray(devs), ("data",))

params = init_dit(jax.random.PRNGKey(0), cfg, zero_init=False)
latents = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg.in_channels, 4, 8, 12))
text = jax.random.normal(jax.random.PRNGKey(2),
                         (1, cfg.text_len, cfg.text_dim))
mask = jnp.ones((1, cfg.text_len), jnp.int32)
c, tr, _ = split_tta_latents(latents, 2, 0.25)

scheme = build_scheme(cfg, AdapterConfig(method="delta_a"))
tx = build_optimizer(OptimConfig(lr=1e-2))
V = 4
tps = jax.tree.map(lambda *xs: jnp.stack(xs), *[
    scheme.init(jax.random.PRNGKey(5 + v), base_params=params)
    for v in range(V)])
osts = jax.tree.map(lambda *xs: jnp.stack(xs), *[
    tx.init(jax.tree.map(lambda a, v=v: a[v], tps)) for v in range(V)])
rngs = jnp.stack([
    jnp.stack([jax.random.PRNGKey(v * 10 + s) for s in range(2)])
    for v in range(V)])

chunk = make_batched_train_chunk(scheme, cfg, tx, mesh=mesh)
tps, osts, losses, _ = chunk(
    tps, osts, params, jnp.stack([c] * V), jnp.stack([tr] * V),
    jnp.stack([text] * V), jnp.stack([mask] * V), rngs)
from jax.sharding import NamedSharding, PartitionSpec as P

# the loss matrix is sharded across processes; reduce to a replicated
# scalar so every process can fetch it
fin, total = jax.jit(
    lambda l: (jnp.all(jnp.isfinite(l)), jnp.sum(l)),
    out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
)(losses)
assert bool(fin), "non-finite losses"
print(f"[p{pid}] loss_sum={float(total):.4f} OK", flush=True)
