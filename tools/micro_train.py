"""Training throughput after the scanned train-chunk refactor (round-1
recorded 65 ms/step for the mlp fast path at 4096 rays with ~8 eager
dispatches + a float(loss) sync per step)."""
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
    min_near=0.05, workspace="/tmp/ws_micro_train", error_map=True,
).finalize()
tr = Trainer("ngp", cfg, use_checkpoint="scratch", seed=0)
tr.mark_untrained_grid(ds.poses, ds.intrinsics)

tr.train_iterations(ds, 100)      # compile + warm
t0 = time.perf_counter()
loss = tr.train_iterations(ds, 400)
dt = time.perf_counter() - t0
print(f"mlp fast path: {400 / dt:.1f} steps/s ({dt / 400 * 1e3:.1f} ms/step) "
      f"loss={loss:.5f}")
