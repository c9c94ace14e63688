from mmgl_tpu.peft.masks import trainable_mask, count_params  # noqa: F401
from mmgl_tpu.peft.virtual_tokens import (  # noqa: F401
    PrefixTuning, PromptTuning)
