"""Device-side batched ops: the TPU-tier of the data/augmentation pipeline plus
custom kernels (NMS, RoIAlign, Pallas attention)."""
