from multipathnet_tpu.models.multipath import MultiPathNet, build_model  # noqa: F401
