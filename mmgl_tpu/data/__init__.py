from mmgl_tpu.data.store import PageStore, load_wikiweb2m  # noqa: F401
from mmgl_tpu.data.assemble import WikiWeb2MAssembler  # noqa: F401
from mmgl_tpu.data.loader import PrefetchLoader  # noqa: F401
