"""One-stage detector assembly + registry.

Capability parity with reference PL_Modules/build_detection.py:23-144: a
`build_model(cfg, num_classes)` factory that composes backbone -> neck ->
head from YAML config sections, plus the OneStageDetector composite
(reference OneStageD, build_detection.py:37-53). The reference's
`eval(name)` registry (a noted design smell, SURVEY.md §3.5) is replaced by
explicit name->constructor dicts.

The loss/decoder stage is deliberately *outside* the flax module: in JAX the
train step computes `loss_fn(model.apply(...), labels)` functionally, and the
eval path maps head outputs through a pure decode. `DetectionModel` bundles
module + loss/decode fns + strides as the single user-facing handle.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Sequence

import jax
from flax import linen as nn

from .backbones.cspdarknet import CSPDarkNet
from .backbones.eelan import EELAN
from .backbones.mobile import CSPMobileNext, ECMNet, MobileNetV3
from .backbones.shufflenetv2 import ShuffleNetV2
from .backbones.swin import SwinTransformer
from .backbones.swinv2 import SwinTransformerV2
from .backbones.vit import VisionTransformer
from .losses.yolox import yolox_eval_decode, yolox_loss
from .losses.yolov7 import yolov7_eval_decode, yolov7_loss
from .necks.csppafpn import CSPPAFPN
from .necks.yolov7_neck import YOLOv7NECK
from .heads.decoupled_head import DecoupledHead
from .heads.implicit_head import ImplicitHead
from .heads.simple_head import SimpleHead
from .losses.yolov5 import (
    DEFAULT_V5_ANCHORS, yolov5_eval_decode, yolov5_loss,
)


class OneStageDetector(nn.Module):
    """backbone -> neck -> head; returns per-level NHWC prediction maps."""

    backbone: nn.Module
    neck: nn.Module | None
    head: nn.Module

    def __call__(self, x: jax.Array, train: bool = False):
        feats = self.backbone(x, train)
        if self.neck is not None:
            feats = self.neck(feats, train)
        return self.head(feats, train)


# ---------------------------------------------------------------------------
# Registries (reference build_detection.py:56-144, minus eval()).
# Each factory: cfg-dict -> flax module. Extended as the zoo widens.
# ---------------------------------------------------------------------------

def _cspdarknet(cfg: dict) -> nn.Module:
    db = cfg.get("drop_block", {}) or {}
    return CSPDarkNet(
        depths=tuple(cfg["depths"]),
        channels=tuple(cfg["channels"]),
        outputs=tuple(cfg["outputs"]),
        depthwise=bool(cfg.get("depthwise", False)),
        norm=cfg.get("norm", "bn"),
        act=cfg.get("act", "silu"),
        drop_block_rate=float(db.get("rate", 0.0)),
        drop_block_size=int(db.get("size", 7)),
    )


def _csppafpn(cfg: dict) -> nn.Module:
    return CSPPAFPN(
        depths=tuple(cfg["depths"]),
        in_channels=tuple(cfg["channels"]),
        depthwise=bool(cfg.get("depthwise", False)),
        norm=cfg.get("norm", "bn"),
        act=cfg.get("act", "silu"),
    )


def _decoupled_head(cfg: dict, num_classes: int) -> nn.Module:
    return DecoupledHead(
        num_classes=num_classes,
        n_anchors=int(cfg.get("num_anchor", 1)),
        in_channels=tuple(cfg["channels"]),
        depthwise=bool(cfg.get("depthwise", False)),
        norm=cfg.get("norm", "bn"),
        act=cfg.get("act", "silu"),
    )


def _eelan(cfg: dict) -> nn.Module:
    return EELAN(
        depths=tuple(cfg["depths"]),
        channels=tuple(cfg["channels"]),
        outputs=tuple(cfg["outputs"]),
        norm=cfg.get("norm", "bn"),
        act=cfg.get("act", "silu"),
    )


def _yolov7neck(cfg: dict) -> nn.Module:
    return YOLOv7NECK(
        depths=tuple(cfg["depths"]),
        in_channels=tuple(cfg["channels"]),
        use_repconv=bool(cfg.get("use_repconv", False)),
        norm=cfg.get("norm", "bn"),
        act=cfg.get("act", "silu"),
    )


def _implicit_head(cfg: dict, num_classes: int) -> nn.Module:
    return ImplicitHead(
        num_classes=num_classes,
        n_anchors=int(cfg.get("num_anchor", 3)),
        in_channels=tuple(cfg["channels"]),
    )


def _staged_mobile(cls):
    def make(cfg: dict) -> nn.Module:
        return cls(
            depths=tuple(cfg["depths"]),
            channels=tuple(cfg["channels"]),
            outputs=tuple(cfg["outputs"]),
            norm=cfg.get("norm", "bn"),
            act=cfg.get("act", "silu"),
        )
    return make


def _shufflenetv2(cfg: dict) -> nn.Module:
    return ShuffleNetV2(
        channels=tuple(cfg.get("channels", (36, 104, 208, 416))),
        outputs=tuple(cfg.get("outputs", ("stage2", "stage3", "stage4"))),
        act=cfg.get("act", "hswish"),
        use_se=bool(cfg.get("use_se", False)),
    )


def _mobilenetv3(size: str):
    def make(cfg: dict) -> nn.Module:
        return MobileNetV3(
            size=size,
            outputs=tuple(cfg.get("outputs", ("stage2", "stage3", "stage4"))),
        )
    return make


def _swin(cfg: dict, v2: bool = False) -> nn.Module:
    klass = SwinTransformerV2 if v2 else SwinTransformer
    return klass(
        embed_dim=int(cfg.get("embed_dim", 96)),
        depths=tuple(cfg.get("depths", (2, 2, 6, 2))),
        num_heads=tuple(cfg.get("num_heads", (3, 6, 12, 24))),
        window_size=int(cfg.get("window_size", 7)),
        mlp_ratio=float(cfg.get("mlp_ratio", 4.0)),
        out_indices=tuple(cfg.get("out_indices", (0, 1, 2, 3))),
        drop_path_rate=float(cfg.get("drop_path_rate", 0.0)),
    )


def _vit(cfg: dict) -> nn.Module:
    return VisionTransformer(
        embed_dim=int(cfg.get("embed_dim", 768)),
        depth=int(cfg.get("depth", 12)),
        num_heads=int(cfg.get("num_heads", 12)),
        patch_size=int(cfg.get("patch_size", 16)),
        mlp_ratio=float(cfg.get("mlp_ratio", 4.0)),
        moe_experts=int(cfg.get("moe_experts", 0)),
        moe_capacity=float(cfg.get("moe_capacity", 1.25)),
    )


def _restv2(cfg: dict) -> nn.Module:
    from .backbones.restv2 import ResTV2
    return ResTV2(
        depths=tuple(cfg.get("depths", (1, 2, 6, 2))),
        embed_dims=tuple(cfg.get("embed_dims", (96, 192, 384, 768))),
        num_heads=tuple(cfg.get("num_heads", (1, 2, 4, 8))),
        sr_ratios=tuple(cfg.get("sr_ratios", (8, 4, 2, 1))),
        drop_path_rate=float(cfg.get("drop_path_rate", 0.0)),
        outputs=tuple(cfg.get("outputs", ("stage2", "stage3", "stage4"))),
    )


def _mctformer(cfg: dict) -> nn.Module:
    from .backbones.mctformer import MCTformer
    return MCTformer(
        num_classes=int(cfg.get("num_cls_tokens", 80)),
        embed_dim=int(cfg.get("embed_dim", 384)),
        depth=int(cfg.get("depth", 12)),
        num_heads=int(cfg.get("num_heads", 6)),
        patch_size=int(cfg.get("patch_size", 16)),
        mlp_ratio=float(cfg.get("mlp_ratio", 4.0)),
    )


def _extras(name: str):
    def make(cfg: dict) -> nn.Module:
        from .backbones import extras
        cls = getattr(extras, name)
        kwargs = {}
        if "depths" in cfg and hasattr(cls, "depths"):
            kwargs["depths"] = tuple(cfg["depths"])
        if "channels" in cfg and hasattr(cls, "channels"):
            kwargs["channels"] = tuple(cfg["channels"])
        if "outputs" in cfg:
            kwargs["outputs"] = tuple(cfg["outputs"])
        return cls(**kwargs)
    return make


BACKBONES: dict[str, Callable[[dict], nn.Module]] = {
    "cspdarknet": _cspdarknet,
    "eelan": _eelan,
    "cspmobilenext": _staged_mobile(CSPMobileNext),
    "ecmnet": _staged_mobile(ECMNet),
    "shufflenetv2": _shufflenetv2,
    "mobilenetv3s": _mobilenetv3("small"),
    "mobilenetv3l": _mobilenetv3("large"),
    "swin_transformer": _swin,
    "swin_transformerv2": functools.partial(_swin, v2=True),
    "vision_transformer": _vit,
    "restv2": _restv2,
    "mctformer": _mctformer,
    # extras the reference ships but never wires (SURVEY §2.3) — wired here
    "efficientrep": _extras("EfficientRep"),
    "resnet": _extras("ResNet"),
    "convnext": _extras("ConvNeXt"),
    "ghostnet": _extras("GhostNet"),
    "vgg": _extras("VGG"),
    "mobilenext": _extras("MobileNeXt"),
}


def _al_pafpn(cfg: dict) -> nn.Module:
    from .necks.pafpn_al import AL_PAFPN
    return AL_PAFPN(
        depths=tuple(cfg["depths"]),
        in_channels=tuple(cfg["channels"]),
        norm=cfg.get("norm", "bn"),
        act=cfg.get("act", "silu"),
    )


NECKS: dict[str, Callable[[dict], nn.Module]] = {
    "csppafpn": _csppafpn,
    "al_pafpn": _al_pafpn,
    "yolov7neck": _yolov7neck,
    "none": lambda cfg: None,
}

def _simple_head(cfg: dict, num_classes: int) -> nn.Module:
    return SimpleHead(
        num_classes=num_classes,
        n_anchors=int(cfg.get("num_anchor", 3)),
        in_channels=tuple(cfg["channels"]),
    )


HEADS: dict[str, Callable[[dict, int], nn.Module]] = {
    "decoupled_head": _decoupled_head,
    "implicit_head": _implicit_head,
    "simple_head": _simple_head,
}


@dataclasses.dataclass(frozen=True)
class LossSpec:
    """Pairs a train-mode loss fn with an eval-mode decode fn."""
    train_loss: Callable[..., dict]      # (head_outputs, labels) -> loss dict
    eval_decode: Callable[..., jax.Array]  # (head_outputs) -> [B, A, 5+C]
    strides: Sequence[int]


def _yolox_loss_spec(cfg: dict, num_classes: int) -> LossSpec:
    strides = tuple(cfg.get("stride", (8, 16, 32)))
    return LossSpec(
        train_loss=functools.partial(
            yolox_loss, num_classes=num_classes, strides=strides,
            use_l1=bool(cfg.get("use_l1", False)),
            # loss: {assign_chunk: N} — label-axis-chunked SimOTA; identical
            # outputs, [chunk, A] peak temps (the HBM lever for batch >128)
            assign_chunk=(int(cfg["assign_chunk"])
                          if cfg.get("assign_chunk") else None),
            # loss: {pallas_assign: true} — fully-fused VMEM assignment
            # kernel; ships OFF (see yolox.py NOTE + PERF.md measurements)
            pallas_assign=bool(cfg.get("pallas_assign", False))),
        eval_decode=functools.partial(yolox_eval_decode, strides=strides),
        strides=strides,
    )


DEFAULT_V7_ANCHORS = (((12, 16), (19, 36), (40, 28)),
                      ((36, 75), (76, 55), (72, 146)),
                      ((142, 110), (192, 243), (459, 401)))


def _yolov7_loss_spec(cfg: dict, num_classes: int) -> LossSpec:
    strides = tuple(cfg.get("stride", (8, 16, 32)))
    anchors = tuple(tuple(tuple(a) for a in lvl)
                    for lvl in cfg.get("anchors", DEFAULT_V7_ANCHORS))
    return LossSpec(
        train_loss=functools.partial(
            yolov7_loss, num_classes=num_classes, strides=strides,
            anchors=anchors,
            label_smoothing=float(cfg.get("label_smoothing", 0.0)),
            # ultralytics order (4.0 on stride-8): the reference's
            # (0.4,1,4) is a copy error — see yolov7_loss docstring
            balance=tuple(cfg.get("balance", (4.0, 1.0, 0.4))),
            gain=dict(cfg.get("gain", {}))),
        eval_decode=functools.partial(
            yolov7_eval_decode, strides=strides, anchors=anchors,
            num_classes=num_classes),
        strides=strides,
    )


def _yolov5_loss_spec(cfg: dict, num_classes: int) -> LossSpec:
    strides = tuple(cfg.get("stride", (8, 16, 32)))
    anchors = tuple(tuple(tuple(a) for a in lvl)
                    for lvl in cfg.get("anchors", DEFAULT_V5_ANCHORS))
    return LossSpec(
        train_loss=functools.partial(
            yolov5_loss, num_classes=num_classes, strides=strides,
            anchors=anchors,
            anchor_threshold=float(cfg.get("anchor_thre", 4.0)),
            balance=tuple(cfg.get("balance", (4.0, 1.0, 0.4))),
            gain=dict(cfg.get("gain", {}))),
        eval_decode=functools.partial(
            yolov5_eval_decode, strides=strides, anchors=anchors,
            num_classes=num_classes),
        strides=strides,
    )


def _yolov3_loss_spec(cfg: dict, num_classes: int) -> LossSpec:
    from .losses.yolov3 import (
        DEFAULT_V3_ANCHORS, yolov3_eval_decode, yolov3_loss,
    )
    strides = tuple(cfg.get("stride", (32, 16, 8)))
    anchors = tuple(tuple(tuple(a) for a in lvl)
                    for lvl in cfg.get("anchors", DEFAULT_V3_ANCHORS))
    img_size = tuple(cfg.get("img_size", (640, 640)))
    return LossSpec(
        train_loss=functools.partial(
            yolov3_loss, num_classes=num_classes, anchors=anchors,
            img_size=img_size,
            ignore_threshold=float(cfg.get("ignore_threshold", 0.5))),
        eval_decode=functools.partial(
            yolov3_eval_decode, strides=strides, anchors=anchors,
            num_classes=num_classes, img_size=img_size),
        strides=strides,
    )


LOSSES: dict[str, Callable[[dict, int], LossSpec]] = {
    "yolox": _yolox_loss_spec,
    "yolov7": _yolov7_loss_spec,
    "yolov5": _yolov5_loss_spec,
    "yolov3": _yolov3_loss_spec,
}


@dataclasses.dataclass(frozen=True)
class DetectionModel:
    """User-facing bundle: flax module + loss/decode + config."""
    module: OneStageDetector
    loss: LossSpec
    num_classes: int
    cfg: dict[str, Any]

    def init(self, rng: jax.Array, input_size=(640, 640), batch_size: int = 1):
        import jax.numpy as jnp
        dummy = jnp.zeros((batch_size, input_size[0], input_size[1], 3), jnp.float32)
        return self.module.init(rng, dummy, False)


def build_model(cfg: dict, num_classes: int) -> DetectionModel:
    """Compose a detector from a model-config dict (build_detection.py:23-34).

    Optional top-level `dtype: bfloat16` enables mixed-precision compute
    (params fp32, conv/BN compute bf16; decode/loss stay fp32)."""
    from ..layers.blocks import set_compute_dtype, set_remat
    set_compute_dtype(cfg.get("dtype", None) or None)
    # top-level `remat: true`: CSP stage layers recompute their interiors
    # in the backward (layers/blocks.py::maybe_remat) — HBM for FLOPs,
    # unlocking batch > 128 (PERF.md remat sweep). Same param tree.
    set_remat(bool(cfg.get("remat", False)))
    b_cfg, n_cfg, h_cfg, l_cfg = cfg["backbone"], cfg["neck"], cfg["head"], cfg["loss"]
    for section, registry, name in (
        ("backbone", BACKBONES, b_cfg["name"]),
        ("neck", NECKS, n_cfg["name"]),
        ("head", HEADS, h_cfg["name"]),
        ("loss", LOSSES, l_cfg["name"]),
    ):
        if name not in registry:
            raise KeyError(
                f"Unknown {section} '{name}'. Available: {sorted(registry)}")
    module = OneStageDetector(
        backbone=BACKBONES[b_cfg["name"]](b_cfg),
        neck=NECKS[n_cfg["name"]](n_cfg),
        head=HEADS[h_cfg["name"]](h_cfg, num_classes),
    )
    loss = LOSSES[l_cfg["name"]](l_cfg, num_classes)
    return DetectionModel(module=module, loss=loss, num_classes=num_classes, cfg=cfg)
