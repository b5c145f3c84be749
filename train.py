"""CLI entry point: python train.py -c <model.yaml> -d <data.yaml> [flags].

Capability parity with reference train.py:10-67 (same flags via
utils/defaults.py:6-22), with the reference's dead --resume/--ckpt wiring
fixed (SURVEY.md §5: parsed but never passed to Trainer.fit there)."""

from __future__ import annotations

import numpy as np

from pl_yolo_tpu.utils.config import (
    load_config, train_argument_parser, validate_data_config,
    validate_model_config,
)


def main():
    from pl_yolo_tpu.utils.tpu_flags import apply_tuned_flags
    apply_tuned_flags()  # swept TPU defaults; user LIBTPU_INIT_ARGS wins

    args = train_argument_parser().parse_args()
    model_cfg = validate_model_config(load_config(args.model_config),
                                      args.model_config)
    data_cfg = validate_data_config(load_config(args.dataset_config),
                                    args.dataset_config)
    if args.data_path:
        data_cfg["dataset"]["dir"] = args.data_path

    np.random.seed(args.seed)  # host-side seed (device PRNG is keyed per step)

    if args.debug_nans:
        import jax
        jax.config.update("jax_debug_nans", True)

    from pl_yolo_tpu.train.trainer import Trainer
    trainer = Trainer(
        model_cfg, data_cfg,
        max_epochs=args.max_epochs or 300,
        output_dir=args.output_dir,
        experiment_name=args.experiment_name,
        logger=args.logger,
        seed=args.seed,
        sanitize=args.sanitize,
    )

    if args.test:
        ckpt = args.ckpt
        if ckpt is None:
            raise SystemExit("--test requires --ckpt <checkpoint dir>")
        trainer.load_weights(ckpt)
        trainer.test(conf=args.conf, nms=args.nms, visualize=args.visualize,
                     show_dir=args.show_dir,
                     show_score_thr=args.show_score_thr)
    else:
        trainer.fit(resume_from=args.ckpt, resume=args.resume)
        if trainer.preempted:
            # distinguish a preemption checkpoint from real completion so
            # restart wrappers (tools/launch_coco300.sh) relaunch with
            # --resume instead of declaring the run done. 75 = EX_TEMPFAIL.
            raise SystemExit(75)


if __name__ == "__main__":
    main()
