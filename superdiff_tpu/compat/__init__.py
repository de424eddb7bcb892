"""Interop with the reference's PyTorch artifacts."""

from superdiff_tpu.compat.torch_import import (  # noqa: F401
    import_checkpoint, infer_ref_arch, ref_params_from_state_dict)
