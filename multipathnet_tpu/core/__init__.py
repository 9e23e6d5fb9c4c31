from multipathnet_tpu.core.config import (  # noqa: F401
    Config,
    DataConfig,
    EvalConfig,
    ModelConfig,
    TrainConfig,
    preset,
    PRESETS,
)
from multipathnet_tpu.core.mesh import MeshRules, make_mesh  # noqa: F401
from multipathnet_tpu.core.padding import pad_to, pad_axis_to  # noqa: F401
