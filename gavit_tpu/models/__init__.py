from gavit_tpu.models.vit import VisionTransformer, build_model  # noqa: F401
from gavit_tpu.models.graph import GraphBlock  # noqa: F401
