import json
import os

import numpy as np
import pytest

from pienerf_tpu.config import PieNeRFConfig
from pienerf_tpu.data import synthetic
from pienerf_tpu.data.provider import NeRFDataset, nerf_matrix_to_ngp


def _ngp_to_blender(pose_ngp: np.ndarray, scale: float, offset) -> np.ndarray:
    """Inverse of nerf_matrix_to_ngp — used to author test datasets."""
    B = np.eye(4, dtype=np.float32)
    P = pose_ngp
    rows = {1: P[0], 2: P[1], 0: P[2]}
    for b_row, p_row in rows.items():
        B[b_row, 0] = p_row[0]
        B[b_row, 1] = -p_row[1]
        B[b_row, 2] = -p_row[2]
        B[b_row, 3] = (p_row[3] - offset[[1, 2, 0].index(b_row)]) / scale
    return B


def _write_blender_dataset(root, n_views=3, H=32, W=32, scale=0.5):
    import cv2

    ds = synthetic.make_dataset(n_views=n_views, H=H, W=W)
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    focal = ds.intrinsics[0]
    frames = []
    for i, (pose, img) in enumerate(zip(ds.poses, ds.images)):
        blender = _ngp_to_blender(pose, scale, [0.0, 0.0, 0.0])
        fp = f"train/r_{i}"
        cv2.imwrite(os.path.join(root, fp + ".png"),
                    cv2.cvtColor((img * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        frames.append({"file_path": fp,
                       "transform_matrix": blender.tolist()})
    transform = {
        "camera_angle_x": 2 * np.arctan(W / (2 * focal)),
        "frames": frames,
    }
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump(transform, f)
    return ds


def test_blender_roundtrip(tmp_path):
    root = str(tmp_path / "scene")
    os.makedirs(root)
    scale = 0.5
    ds = _write_blender_dataset(root, scale=scale)

    cfg = PieNeRFConfig(path=root, scale=scale, bound=1.0).finalize()
    loaded = NeRFDataset(cfg, type="train")
    assert loaded.mode == "blender"
    assert loaded.H == 32 and loaded.W == 32
    assert loaded.poses.shape == (3, 4, 4)
    # poses roundtrip through the blender <-> ngp conversion
    np.testing.assert_allclose(loaded.poses, ds.poses, atol=1e-4)
    # intrinsics recovered from camera_angle_x
    np.testing.assert_allclose(loaded.intrinsics[0], ds.intrinsics[0],
                               rtol=1e-5)
    # images roundtrip through png encode (8-bit quantization)
    np.testing.assert_allclose(loaded.images, ds.images, atol=0.01)


def test_missing_dataset_raises(tmp_path):
    cfg = PieNeRFConfig(path=str(tmp_path)).finalize()
    with pytest.raises(NotImplementedError):
        NeRFDataset(cfg, type="train")


def test_rand_poses_orbit():
    from pienerf_tpu.data.provider import rand_poses
    poses = rand_poses(16, radius=2.0, seed=1)
    assert poses.shape == (16, 4, 4)
    np.testing.assert_allclose(np.linalg.norm(poses[:, :3, 3], axis=1), 2.0,
                               rtol=1e-5)
    # rotation part orthogonal, camera looks at the origin (+z = forward)
    R = poses[:, :3, :3]
    np.testing.assert_allclose(np.einsum("nij,nik->njk", R, R),
                               np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    fwd = R[:, :, 2]
    np.testing.assert_allclose(fwd, -poses[:, :3, 3] / 2.0, atol=1e-5)


def test_colmap_test_split_slerp(tmp_path):
    import cv2

    root = str(tmp_path / "colmap")
    os.makedirs(root)
    ds = synthetic.make_dataset(n_views=4, H=16, W=16)
    frames = []
    for i, pose in enumerate(ds.poses):
        blender = _ngp_to_blender(pose, 0.5, [0.0, 0.0, 0.0])
        fp = f"r_{i}.png"
        cv2.imwrite(os.path.join(root, fp),
                    (ds.images[i, :, :, ::-1] * 255).astype(np.uint8))
        frames.append({"file_path": fp, "transform_matrix": blender.tolist()})
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump({"camera_angle_x": 0.9, "h": 16, "w": 16,
                   "frames": frames}, f)

    cfg = PieNeRFConfig(path=root, scale=0.5, bound=1.0).finalize()
    train = NeRFDataset(cfg, type="train")
    assert train.mode == "colmap"
    assert len(train.poses) == 3          # first frame held out as val
    test = NeRFDataset(cfg, type="test", n_test=6)
    assert test.poses.shape == (7, 4, 4)
    assert test.images is None
    # interpolated poses have orthonormal rotations
    R = test.poses[:, :3, :3]
    np.testing.assert_allclose(np.einsum("nij,nik->njk", R, R),
                               np.tile(np.eye(3), (7, 1, 1)), atol=1e-5)
