from mvlt_tpu.convert.torch_to_jax import convert_state_dict, convert_checkpoint

__all__ = ["convert_state_dict", "convert_checkpoint"]
