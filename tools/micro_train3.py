"""Steady-state training throughput: warm the 25-step chunk, then time 200
steps through it (one sync per chunk)."""
import time
import numpy as np
import jax

from pienerf_tpu.config import PieNeRFConfig
from pienerf_tpu.data import synthetic
from pienerf_tpu.train.trainer import Trainer

ds = synthetic.make_dataset(n_views=12, H=256, W=256, seed=0)
cfg = PieNeRFConfig(
    bound=1.0, dt_gamma=0.0, iters=2000, num_rays=4096,
    max_steps=256, train_max_samples=128, density_thresh=0.5,
    min_near=0.05, workspace="/tmp/ws_micro_train3", error_map=True,
).finalize()
tr = Trainer("ngp", cfg, use_checkpoint="scratch", seed=0)
tr.mark_untrained_grid(ds.poses, ds.intrinsics)

tr.train_iterations(ds, 8)                       # compile the sub-chunk
for rep in range(3):
    t0 = time.perf_counter()
    loss = tr.train_iterations(ds, 200)
    dt = time.perf_counter() - t0
    print(f"rep{rep}: {200/dt:.1f} steps/s ({dt/200*1e3:.1f} ms/step) "
          f"loss={loss:.5f}", flush=True)
