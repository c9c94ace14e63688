from mmgl_tpu.utils.tokenizer import ByteTokenizer, get_tokenizer  # noqa: F401
from mmgl_tpu.utils.meters import AverageMeter, ProgressMeter, Summary  # noqa: F401
