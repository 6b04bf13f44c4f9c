"""Sample a physics point cloud from a trained field
(reference: main_sample.py).

    python main_sample.py --workspace model/lego --exp_name lego \
        --sub_res 256 --density_threshold 0.05
"""

import argparse
import os

from pienerf_tpu.config import get_shared_opts


def main():
    cfg = get_shared_opts(argparse.ArgumentParser())

    from pienerf_tpu.sample import AdaptiveUniformSampling
    from pienerf_tpu.train.trainer import Trainer

    trainer = Trainer("ngp", cfg, workspace=cfg.workspace,
                      use_checkpoint=cfg.ckpt)
    if trainer.global_step == 0:
        raise SystemExit(f"no checkpoint found under {cfg.workspace}")

    out_dir = os.path.join("model",
                           os.path.basename(cfg.workspace.rstrip("/")))
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{cfg.exp_name}.ply")

    sampler = AdaptiveUniformSampling(cfg, trainer.state.ema_params,
                                      trainer.spec)
    res = sampler.sample(write_path=out)
    print(f"{res['points'].shape[0]} points -> {os.path.abspath(out)}")
    print("annotate pin/lam/mu/mass attributes before simulation "
          "(see README)")


if __name__ == "__main__":
    main()
