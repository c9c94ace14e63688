from mmgl_tpu.models.opt import OPTConfig, OPTForCausalLM  # noqa: F401
