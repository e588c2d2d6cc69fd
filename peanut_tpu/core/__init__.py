from .checkpoint import (
    load_torch_state_dict,
    convert_encoder_decoder_state,
    save_checkpoint,
    load_checkpoint,
)
from .mesh import make_mesh, data_sharding, replicate

__all__ = [
    "load_torch_state_dict",
    "convert_encoder_decoder_state",
    "save_checkpoint",
    "load_checkpoint",
    "make_mesh",
    "data_sharding",
    "replicate",
]
