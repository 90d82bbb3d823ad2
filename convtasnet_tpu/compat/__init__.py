"""Interop with the reference PyTorch implementation: state_dict <-> pytree
parameter conversion and .pth.tar package import/export."""

from .torch_convert import (  # noqa: F401
    config_from_package,
    import_package,
    params_from_state_dict,
    state_dict_from_params,
)
