"""Extra-backbone shape tests (the reference's unwired modules, now wired)."""

import jax
import jax.numpy as jnp
import pytest

from pl_yolo_tpu.models.detector import build_model


EXTRAS = {
    "efficientrep": {"depths": [1, 1, 1, 1], "channels": [8, 16, 32, 64, 128],
                     "chans": (32, 64, 128)},
    "resnet": {"depths": [1, 1, 1, 1], "channels": [8, 16, 32, 64],
               "chans": (16, 32, 64)},
    "convnext": {"depths": [1, 1, 1, 1], "channels": [8, 16, 32, 64],
                 "chans": (16, 32, 64)},
    "ghostnet": {"chans": (40, 112, 160)},
    "vgg": {"channels": [8, 16, 32, 64, 64], "chans": (32, 64, 64)},
    "mobilenext": {"depths": [1, 1, 1, 1], "channels": [8, 16, 32, 64, 128],
                   "chans": (32, 64, 128)},
}


@pytest.mark.parametrize("name", sorted(EXTRAS))
def test_extra_backbone_detector(name):
    spec = dict(EXTRAS[name])
    chans = spec.pop("chans")
    cfg = {
        "backbone": dict(name=name, outputs=["stage2", "stage3", "stage4"],
                         **spec),
        "neck": {"name": "csppafpn", "depths": [1, 1, 1, 1],
                 "channels": list(chans)},
        "head": {"name": "decoupled_head", "num_anchor": 1,
                 "channels": list(chans)},
        "loss": {"name": "yolox", "stride": [8, 16, 32]},
        "optimizer": {"name": "SGD", "learning_rate": 0.01},
    }
    model = build_model(cfg, num_classes=3)
    v = model.init(jax.random.key(0), input_size=(64, 64))
    outs = model.module.apply(v, jnp.zeros((1, 64, 64, 3)), False)
    assert [o.shape[1] for o in outs] == [8, 4, 2]      # strides 8/16/32
    dec = model.loss.eval_decode(outs)
    assert dec.shape == (1, 64 + 16 + 4, 8)
