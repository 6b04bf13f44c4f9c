"""tools/validate_asset.py end-to-end on synthetic stand-ins (round-3
item 7): the one-command chain that will score a real released asset the
moment one ships. Uses a random-init hashgrid exported to a REAL torch
.pth plus a tiny annotated physics cube PLY."""

import json
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.mark.slow
def test_validate_asset_chain(tmp_path):
    import validate_asset

    from pienerf_tpu.io import checkpoint as ckpt_io
    from pienerf_tpu.io.ply import write_ply
    from pienerf_tpu.models import network

    # synthetic stand-in .pth (reference checkpoint layout)
    t_spec = network.make_spec(bound=0.5, backbone="hashgrid")
    t_params = network.init_params(jax.random.PRNGKey(3), t_spec)
    pth = str(tmp_path / "ngp_ep0300.pth")
    ckpt_io.save_torch_ngp(pth, t_params)

    # annotated physics PLY (verify-cube config; known stable)
    g = np.linspace(0.3, 0.7, 8) - 0.5
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    p = np.stack([x.ravel(), y.ravel(), z.ravel()], 1)
    n = len(p)
    ply = str(tmp_path / "cube.ply")
    write_ply(ply, p, vp=np.full(n, 1e-3),
              pin=(p[:, 1] > 0.15).astype(float),
              lam=np.full(n, 1e4), mu=np.full(n, 1e4),
              mass=np.full(n, 0.1))

    out = str(tmp_path / "report.json")
    report = validate_asset.run(
        pth, ply, out, bound=0.5, n_poses=2, H=32, W=32,
        distill_steps=25, student_width=64, sim_dx=0.2, kres=4,
        bench_frames=2, render_samples=16, n_grid_updates=1,
        cache_dir=str(tmp_path / "cache"))

    assert os.path.exists(out)
    saved = json.load(open(out))
    for key in ("import", "distill", "field_agreement", "image_agreement",
                "sim_init", "interactive", "verdict"):
        assert key in saved, key
    assert saved["import"]["ok"]
    assert np.isfinite(saved["distill"]["final_loss"])
    assert len(saved["image_agreement"]["psnr_per_view"]) == 2
    assert all(np.isfinite(v)
               for v in saved["image_agreement"]["psnr_per_view"])
    assert saved["interactive"]["fps"] > 0
    assert report["sim_init"]["n_ip"] > 0
