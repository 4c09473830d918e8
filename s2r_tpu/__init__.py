"""s2r_tpu — a TPU-native framework for synthetic-to-real semantic segmentation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
haofengsiji/synthetic-to-real-semantic-segmentation (PyTorch):

- DeepLab-V3+ (MobileNetV2 backbone, ASPP, decoder) segmenter
- two unsupervised domain-adaptation methods:
  feature-space adversarial adaption   (reference: train.py + modeling/domian.py)
  output-space adversarial adaption    (reference: train_adapt.py + modeling/discriminator.py)
- GTA5 -> Cityscapes data pipeline, mIoU evaluation, checkpointing,
  TensorBoard-style summaries, and train/val/test CLI drivers.

Design notes (TPU-first, not a port):
- NHWC layouts everywhere; convs via lax.conv_general_dilated; bf16 compute /
  f32 params+stats by default.
- Data parallelism is GSPMD: train steps are jitted with the batch dimension
  sharded over a jax.sharding.Mesh.  Cross-replica SyncBatchNorm (reference:
  modeling/sync_batchnorm/) is *implicit*: batch-statistics reductions over a
  sharded batch compile to psums over ICI; no host-side master/slave comm.
- Each training method (source-only / feature adaption / output adaption) is a
  single jitted SPMD step: segmenter + discriminator updates traced together,
  using stop_gradient partitioning instead of requires_grad toggling.
"""

__version__ = "0.1.0"
