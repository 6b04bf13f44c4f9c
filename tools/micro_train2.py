"""Bisect the TPU worker crash in the scanned train chunk: run chunks of
increasing n_steps."""
import sys
import time
import numpy as np
import jax

from pienerf_tpu.config import PieNeRFConfig
from pienerf_tpu.data import synthetic
from pienerf_tpu.train.trainer import Trainer

n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
ds = synthetic.make_dataset(n_views=12, H=256, W=256, seed=0)
cfg = PieNeRFConfig(
    bound=1.0, dt_gamma=0.0, iters=2000, num_rays=4096,
    max_steps=256, train_max_samples=128, density_thresh=0.5,
    min_near=0.05, workspace="/tmp/ws_micro_train2", error_map=True,
).finalize()
tr = Trainer("ngp", cfg, use_checkpoint="scratch", seed=0)
tr.mark_untrained_grid(ds.poses, ds.intrinsics)

t0 = time.perf_counter()
loss = tr.train_iterations(ds, n)
print(f"n={n}: warm chunk ok, {time.perf_counter()-t0:.1f}s loss={loss:.5f}",
      flush=True)
t0 = time.perf_counter()
loss = tr.train_iterations(ds, 4 * n)
dt = time.perf_counter() - t0
print(f"n={4*n}: {4*n/dt:.1f} steps/s ({dt/(4*n)*1e3:.1f} ms/step) "
      f"loss={loss:.5f}", flush=True)
