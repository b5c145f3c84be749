"""pl_yolo_tpu — a TPU-native (JAX/XLA/Pallas) one-stage object-detection framework.

Re-designed from scratch with the capabilities of the reference framework
(Iywie/pl_YOLO, a PyTorch-Lightning YOLO family trainer): interchangeable
backbone / neck / head / loss modules selected by YAML configs, COCO / VOC
data pipelines with mosaic / mixup / HSV / flip augmentation (device-side
here), COCO-mAP and VOC-AP evaluation, and a full train / val / test CLI.

TPU-first design notes (vs. reference /root/reference):
  * NHWC layout + fused conv-BN-SiLU blocks so XLA tiles convs onto the MXU.
  * Fixed shapes everywhere: padded label batches, fixed-size NMS, batched
    fixed-shape SimOTA (the reference's per-image dynamic-shape Python loop,
    models/losses/yolox/yolox_loss.py:54-139, is re-architected as one
    vmapped masked computation).
  * One jit-compiled train step over a jax.sharding.Mesh (GSPMD data
    parallelism; cross-device BN stats come out of global batch reductions).
  * Device-side augmentation (mosaic / affine warp / HSV / mixup / flip)
    fused into a single jit program that overlaps with the host loader.
"""

__version__ = "0.1.0"
