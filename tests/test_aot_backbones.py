"""AOT flagship-proof harness (scripts/aot_backbones.py) exercised at
tiny preset scale on the virtual mesh: per-arch TP sharding rules must
lower + compile the forward and the delta_a train step and report
memory. (The full cogvideox_5b / opensora_v2 geometries run via the
script itself; this keeps the harness and the sharding rules covered
in CI.)"""

import os
import sys

import jax
import numpy as np
import pytest


@pytest.mark.parametrize("preset,geom", [
    ("cogvideox_tiny", (3, 8, 12)),
    ("opensora_v2_tiny", (3, 8, 12)),
])
def test_aot_backbone_tiny(preset, geom):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from aot_backbones import run_preset

    from longcat_video_tta_tpu.config import MeshConfig
    from longcat_video_tta_tpu.parallel import build_mesh

    mesh = build_mesh(MeshConfig(data=1, context=1, tensor=2),
                      devices=jax.devices()[:2])
    out = run_preset(preset, mesh, 2, geom=geom)
    fwd = out[f"{preset}_forward"]
    step = out[f"{preset}_delta_a_train_step"]
    assert fwd["per_chip_total_bytes"] > 0
    assert step["per_chip_total_bytes"] > 0


def test_param_specs_cover_backbone_archs():
    """Every TP rule path must exist in the corresponding param tree
    (a renamed param would silently fall back to replication)."""
    import jax.numpy as jnp

    from longcat_video_tta_tpu.config import get_model_config
    from longcat_video_tta_tpu.models.cogvideox import init_cogvideox
    from longcat_video_tta_tpu.models.mmdit import init_mmdit
    from longcat_video_tta_tpu.parallel.sharding import (
        _RULES_BY_ARCH,
        _path_str,
        param_specs,
    )

    for preset, init in (("cogvideox_tiny", init_cogvideox),
                         ("opensora_v2_tiny", init_mmdit)):
        cfg = get_model_config(preset)
        shapes = jax.eval_shape(
            lambda k, c=cfg.dit, i=init: i(k, c, zero_init=False),
            jax.random.PRNGKey(0))
        paths = {
            _path_str(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(shapes)[0]
        }
        rules = _RULES_BY_ARCH[cfg.arch]
        missing = [suffix for suffix, _ in rules if suffix not in paths]
        assert not missing, f"{preset}: TP rules match nothing: {missing}"
        specs = param_specs(shapes, arch=cfg.arch)
        n_sharded = sum(
            1 for s in jax.tree_util.tree_leaves(
                specs, is_leaf=lambda x: hasattr(x, "index"))
            if "tensor" in str(s))
        assert n_sharded >= len(rules) - 2
