import os

import numpy as np
import pytest

from pienerf_tpu.io.framesink import FrameSink, native_available


def test_framesink_roundtrip(tmp_path):
    import imageio.v2 as imageio

    rng = np.random.RandomState(0)
    frame = (rng.rand(64, 48, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "a.png")
    with FrameSink(2) as s:
        s.push(p, frame)
        s.flush()
    back = imageio.imread(p)
    np.testing.assert_array_equal(back, frame)


def test_framesink_float_input(tmp_path):
    import imageio.v2 as imageio

    frame = np.linspace(0, 1, 32 * 32 * 3).reshape(32, 32, 3)
    p = str(tmp_path / "b.png")
    with FrameSink(1) as s:
        s.push(p, frame)
        s.flush()
    back = imageio.imread(p)
    np.testing.assert_array_equal(
        back, (np.clip(frame, 0, 1) * 255).astype(np.uint8))


def test_framesink_many_frames(tmp_path):
    frames = [(np.full((16, 16, 3), i, np.uint8)) for i in range(20)]
    with FrameSink(3) as s:
        for i, f in enumerate(frames):
            s.push(str(tmp_path / f"f{i}.png"), f)
    assert len(os.listdir(tmp_path)) == 20


@pytest.mark.skipif(not native_available(), reason="native sink not built")
def test_native_sink_is_loaded():
    assert native_available()
