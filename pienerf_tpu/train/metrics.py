"""Quality metrics: PSNR, SSIM (reference: nerf/utils.py:231-339).

LPIPS requires pretrained perceptual weights that are not vendored; the
meter raises with a clear message if measured without them.
"""

from __future__ import annotations

from typing import List

import numpy as np


def psnr(pred: np.ndarray, gt: np.ndarray) -> float:
    mse = float(np.mean((np.asarray(pred, np.float64) - np.asarray(gt, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return -10.0 * np.log10(mse)


def _gaussian_kernel(size=11, sigma=1.5):
    ax = np.arange(size) - size // 2
    k = np.exp(-(ax**2) / (2 * sigma**2))
    k = np.outer(k, k)
    return k / k.sum()


def ssim(pred: np.ndarray, gt: np.ndarray, data_range: float = 1.0) -> float:
    """Windowed SSIM over channels (Wang et al. 2004), numpy implementation."""
    from scipy.signal import fftconvolve

    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    if pred.ndim == 2:
        pred, gt = pred[..., None], gt[..., None]
    k = _gaussian_kernel()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    vals = []
    for c in range(pred.shape[-1]):
        x, y = pred[..., c], gt[..., c]
        mx = fftconvolve(x, k, mode="valid")
        my = fftconvolve(y, k, mode="valid")
        mxx = fftconvolve(x * x, k, mode="valid")
        myy = fftconvolve(y * y, k, mode="valid")
        mxy = fftconvolve(x * y, k, mode="valid")
        vx = mxx - mx**2
        vy = myy - my**2
        cxy = mxy - mx * my
        s = ((2 * mx * my + c1) * (2 * cxy + c2)) / (
            (mx**2 + my**2 + c1) * (vx + vy + c2)
        )
        vals.append(s.mean())
    return float(np.mean(vals))


class PSNRMeter:
    def __init__(self):
        self.vals: List[float] = []

    def update(self, pred, gt):
        self.vals.append(psnr(pred, gt))

    def measure(self) -> float:
        return float(np.mean(self.vals)) if self.vals else 0.0

    def clear(self):
        self.vals = []

    def report(self) -> str:
        return f"PSNR = {self.measure():.6f}"


class SSIMMeter(PSNRMeter):
    def update(self, pred, gt):
        self.vals.append(ssim(pred, gt))

    def report(self) -> str:
        return f"SSIM = {self.measure():.6f}"


class LPIPSMeter(PSNRMeter):
    """LPIPS(alex) via train/lpips.py — needs a pretrained-weight npz
    (not vendored; see that module's docstring for the one-line export).
    `available()` gates use; update() raises with instructions otherwise."""

    def __init__(self):
        super().__init__()
        self._w = None

    @staticmethod
    def available() -> bool:
        from pienerf_tpu.train import lpips as lp
        return lp.available()

    def update(self, pred, gt):
        from pienerf_tpu.train import lpips as lp
        if self._w is None:
            self._w = lp.load_weights()    # raises with instructions
        v = lp.lpips(np.asarray(pred)[None], np.asarray(gt)[None], self._w)
        self.vals.append(float(np.asarray(v)[0]))

    def report(self) -> str:
        return f"LPIPS = {self.measure():.6f}"
