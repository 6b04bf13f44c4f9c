"""Distill an imported hashgrid checkpoint into the interactive mlp
backbone (see train/distill.py and the PERF.md row-gather spike for why:
hash-grid gathers cap at ~0.03 G rows/s on this hardware, so reference
`ngp_ep*.pth` checkpoints render offline-only until distilled).

    python main_distill.py --workspace model/chair --steps 4000
    # -> writes an mlp checkpoint next to the hashgrid ones; then:
    python main_viewer.py --workspace model/chair --backbone mlp ...
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=4000)
    parser.add_argument("--batch", type=int, default=8192)
    parser.add_argument("--distill_lr", type=float, default=5e-3)
    parser.add_argument("--student_width", type=int, default=64,
                        choices=(64, 128),
                        help="student MLP width. 64 holds >=30 FPS "
                             "deformed at 800x800 with 40.6 dB teacher "
                             "agreement; 128 fills the MXU tile for max "
                             "fidelity (43.6 dB at 25 FPS) — PERF.md "
                             "'Distillation fidelity'")
    from pienerf_tpu.config import get_shared_opts
    cfg = get_shared_opts(parser)
    ns, _ = parser.parse_known_args()

    from pienerf_tpu.train import distill
    from pienerf_tpu.train.trainer import Trainer

    teacher = Trainer("ngp", cfg, workspace=cfg.workspace,
                      use_checkpoint=cfg.ckpt)
    if teacher.spec.backbone != "hashgrid":
        raise SystemExit("--workspace must hold a hashgrid checkpoint "
                         "(the mlp backbone is already interactive)")

    s_params, s_spec, loss = distill.distill(
        teacher.state.ema_params, teacher.spec,
        steps=ns.steps, batch=ns.batch, lr=ns.distill_lr, log_fn=teacher.log,
        student_width=ns.student_width)
    diag = distill.field_agreement(teacher.state.ema_params, teacher.spec,
                                   s_params, s_spec)
    teacher.log(f"[distill] agreement: {diag}")

    # save as an mlp-backbone checkpoint the viewer can load
    cfg2 = cfg
    cfg2.backbone = "mlp"
    student = Trainer("ngp", cfg2, spec=s_spec, workspace=cfg.workspace,
                      use_checkpoint="scratch")
    student.state = student.state._replace(params=s_params,
                                           ema_params=s_params)
    student.global_step = teacher.global_step
    path = student.save_checkpoint()
    print(f"[distill] wrote mlp checkpoint: {path}")


if __name__ == "__main__":
    main()
