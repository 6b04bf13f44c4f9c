"""Trained-field golden regression at meaningful resolution (round-3
review weakness #7 / round-4 item 8).

The 48x48 random-weight goldens in test_goldens.py pin kernel semantics
but cannot catch multi-dB fidelity regressions on real geometry — the
class of bug round 3 actually found (reach-scaled candidate windows) and
round 3.5 fixed again (full-precision candidate fetch). This file commits
a 256x256 fused-path frame AND an exact-bending-oracle frame, both
rendered from the checkpoint this repo trained (runs/quality_mlp_800,
30k iters, 800x800 protocol), under a deterministic analytic twist
deformation. The test re-renders the fused frame and asserts PSNR floors
against BOTH committed frames, so a window/selection-logic change that
silently costs >~0.1 dB vs the exact oracle fails here before it reaches
bench.

A 96x96 twin of the same check runs in the fast tier (ADVICE r4: the
guard must actually execute in the default tier); the 256 variant stays
in the full tier.

Goldens are generated once (TPU or CPU — f32, deterministic sampling)
with:  python tests/test_trained_golden.py --regen
Reference analogue: the main_render.py offline deterministic harness
(reference main_render.py:86-97) rendered from a released ngp_ep*.pth.
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
CKPT = os.path.join(os.path.dirname(__file__), "..",
                    "runs/quality_mlp_800/checkpoints/ngp_ep0015.npz")

# PSNR floors (dB) vs the committed frames, per resolution. Round-5 regen
# (after the auto beam-margin fix, margin_of = reach): the fused frame
# scores 93.6 dB (256) vs the exact oracle under this amp=0.6 twist —
# up from 42.2 at the round-4 fixed margin 0.08, the measured worst point
# of the amplitude sweep (PERF.md "beam margin"). Cross-platform
# fused-render agreement measured 65-70 dB (CPU render vs TPU-generated
# goldens, /tmp runs 2026-08-19), so floors at 55 trip on the old
# 42-48 dB failure class with ~10 dB of re-jit/platform headroom.
_VARIANTS = {
    256: {"golden": "trained_256_v1.npz",
          "floor_vs_fused": 55.0, "floor_vs_exact": 55.0},
    96: {"golden": "trained_96_v1.npz",
         "floor_vs_fused": 55.0, "floor_vs_exact": 55.0},
}


def _load_trained():
    import jax.numpy as jnp  # noqa: F401

    from pienerf_tpu.io import checkpoint as ckpt_io
    from pienerf_tpu.models import network
    from pienerf_tpu.ops.pallas import field_kernel

    tree, _ = ckpt_io.load_native(os.path.abspath(CKPT))
    params = tree.get("ema_params", tree.get("params", tree))
    nf = (params["sigma_net"][0].shape[0] // 3 - 1) // 2
    spec = network.make_spec(
        bound=1.0, backbone="mlp", compute_dtype="float32",
        n_freqs=nf, num_layers=len(params["sigma_net"]))
    pw = field_kernel.pack_weights(params, spec)
    return spec, params, pw


def _twist_state(dx=0.08, r0=0.45, amp=0.6):
    """Deterministic analytic twist of a sphere IP cloud (no sim in the
    loop: the golden pins the RENDER stack, not the solver — the solver
    has its own f64 trajectory oracles in test_solver.py)."""
    c = np.arange(-r0, r0 + 1e-6, dx, dtype=np.float32)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    p_ori = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    p_ori = p_ori[np.linalg.norm(p_ori, axis=1) <= r0]
    ang = amp * p_ori[:, 1]
    ca, sa = np.cos(ang), np.sin(ang)
    p_def = np.stack([
        ca * p_ori[:, 0] + sa * p_ori[:, 2],
        p_ori[:, 1],
        -sa * p_ori[:, 0] + ca * p_ori[:, 2],
    ], 1).astype(np.float32)
    n = p_ori.shape[0]
    F = np.zeros((n, 3, 3), np.float32)
    F[:, 0, 0] = ca; F[:, 0, 2] = sa
    F[:, 1, 1] = 1.0
    F[:, 2, 0] = -sa; F[:, 2, 2] = ca
    # dF = dF/dy of the rotation: exact gradient of the twist map
    dF = np.zeros((n, 3, 3, 3), np.float32)
    dF[:, 0, 0, 1] = -amp * sa; dF[:, 0, 2, 1] = amp * ca
    dF[:, 2, 0, 1] = -amp * ca; dF[:, 2, 2, 1] = -amp * sa
    return p_ori, p_def, F, dF, dx


def _settings(spec, dx, res):
    from pienerf_tpu.ops import beam_bend
    from pienerf_tpu.render import interactive

    bst = beam_bend.BeamBendSettings(
        num_seek_ip=3, max_iter_num=1, ip_dx=1.05 * dx,
        ips_per_tile=256, bin_capacity=8)
    return interactive.InteractiveSettings(
        spec=spec, bend=bst, tile=16, samples=128, active_frac=1.0,
        tile_chunk=16, min_near=0.05, tighten_sampling=False)


def _pose_intr(res):
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)
    return pose, (1.2 * res, 1.2 * res, res / 2.0, res / 2.0)


def _render_fused(res):
    import jax.numpy as jnp

    from pienerf_tpu.ops import beam_bend
    from pienerf_tpu.render import interactive

    spec, params, pw = _load_trained()
    p_ori, p_def, F, dF, dx = _twist_state()
    ist = _settings(spec, dx, res)
    pose, intr = _pose_intr(res)
    pack = beam_bend.pack_ip_data_fast(
        jnp.asarray(p_def), jnp.asarray(p_ori), jnp.asarray(F),
        jnp.asarray(dF))
    out = interactive.render_frame_fused(
        ist, pw, pack, jnp.asarray(p_def), jnp.asarray(pose), intr,
        res, res, jnp.float32(1.0))
    return interactive.tiles_to_image(
        np.asarray(out["tiles_image"], np.float32), res, res)


def _render_exact(res):
    import jax.numpy as jnp

    from pienerf_tpu.render import interactive

    spec, params, pw = _load_trained()
    p_ori, p_def, F, dF, dx = _twist_state()
    ist = _settings(spec, dx, res)
    pose, intr = _pose_intr(res)
    out = interactive.render_frame_exact(
        ist, pw, jnp.asarray(p_def), jnp.asarray(p_ori), jnp.asarray(F),
        jnp.asarray(dF), jnp.asarray(pose), intr, res, res,
        jnp.float32(1.0))
    return interactive.tiles_to_image(
        np.asarray(out["tiles_image"], np.float32), res, res)


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def _check(res):
    v = _VARIANTS[res]
    golden = os.path.join(GOLDEN_DIR, v["golden"])
    assert os.path.exists(golden), f"golden missing; run --regen ({golden})"
    img = _render_fused(res)
    g = np.load(golden)
    p_fused = _psnr(img, g["fused"].astype(np.float32))
    p_exact = _psnr(img, g["exact"].astype(np.float32))
    assert np.isfinite(img).all()
    assert p_fused >= v["floor_vs_fused"], (
        f"fused {res} frame drifted from committed golden: {p_fused:.1f} dB")
    assert p_exact >= v["floor_vs_exact"], (
        f"fused {res} frame lost fidelity vs exact-bending oracle: "
        f"{p_exact:.1f} dB")


@pytest.mark.skipif(not os.path.exists(CKPT),
                    reason="trained checkpoint not present")
def test_trained_field_golden():
    _check(256)


@pytest.mark.skipif(not os.path.exists(CKPT),
                    reason="trained checkpoint not present")
def test_trained_field_golden_fast():
    _check(96)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if "--regen" in sys.argv:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for res, v in _VARIANTS.items():
            golden = os.path.join(GOLDEN_DIR, v["golden"])
            if os.path.exists(golden) and "--force" not in sys.argv:
                print(f"{golden} exists; skipping (use --force)")
                continue
            fused = _render_fused(res)
            exact = _render_exact(res)
            p = _psnr(fused, exact)
            np.savez_compressed(
                golden, fused=fused.astype(np.float16),
                exact=exact.astype(np.float16))
            print(f"golden {res} written: fused-vs-exact {p:.2f} dB, "
                  f"means {fused.mean():.4f}/{exact.mean():.4f}")
