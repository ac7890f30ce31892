"""Pallas TPU kernels and fused XLA ops: attention, graph aggregation,
device-side image preprocessing."""

from gavit_tpu.ops.attention import multi_head_attention  # noqa: F401
from gavit_tpu.ops.graph_ops import (  # noqa: F401
    build_adjacency,
    graph_aggregate,
    fused_graph_aggregate,
)
