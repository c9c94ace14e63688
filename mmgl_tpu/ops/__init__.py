from mmgl_tpu.ops.attention import multi_head_attention  # noqa: F401
