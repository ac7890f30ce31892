from gavit_tpu.models.vit import VisionTransformer, build_model  # noqa: F401
from gavit_tpu.models.graph import GraphBlock  # noqa: F401
from gavit_tpu.models.tome import (  # noqa: F401
    bipartite_merge,
    tome_forward,
    tome_forward_fn,
)
from gavit_tpu.models.mae import (  # noqa: F401
    MAEViT,
    export_reference_pth,
    mae_loss,
)
from gavit_tpu.models.moe import (  # noqa: F401
    MoEMlp,
    expert_capacity,
    router_dispatch,
    upcycle_params,
)
