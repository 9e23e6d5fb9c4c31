from multipathnet_tpu.data import coco, rle  # noqa: F401
