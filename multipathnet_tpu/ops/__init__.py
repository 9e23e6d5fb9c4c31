from multipathnet_tpu.ops import boxes, nms  # noqa: F401
