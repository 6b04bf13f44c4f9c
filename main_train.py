"""Train a radiance field from posed images (reference: main_train.py).

    python main_train.py --path data/lego --dataset_type synthetic -O \
        --workspace model/lego
"""

import argparse
import os

import numpy as np

from pienerf_tpu.config import get_shared_opts


def main():
    cfg = get_shared_opts(argparse.ArgumentParser())

    from pienerf_tpu.data.provider import NeRFDataset
    from pienerf_tpu.train.trainer import Trainer

    train_ds = NeRFDataset(cfg, type="train")
    try:
        valid_ds = NeRFDataset(cfg, type="val", downscale=1)
    except (FileNotFoundError, NotImplementedError):
        valid_ds = None

    trainer = Trainer("ngp", cfg, workspace=cfg.workspace,
                      use_checkpoint=cfg.ckpt)
    trainer.mark_untrained_grid(train_ds.poses, train_ds.intrinsics)
    trainer.train(train_ds, valid_ds, max_iters=cfg.iters)

    if valid_ds is not None:
        psnr = trainer.evaluate(valid_ds)
        trainer.log(f"[final eval] PSNR={psnr:.3f}")

    # save a density point cloud next to the checkpoints
    # (reference main_train.py:101)
    trainer.save_point_cloud(
        os.path.join(cfg.workspace, "point_cloud.ply"), resolution=256)


if __name__ == "__main__":
    main()
