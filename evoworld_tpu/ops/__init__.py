from evoworld_tpu.ops.splat import splat_points_to_pano
from evoworld_tpu.ops.attention import multi_head_attention

__all__ = ["splat_points_to_pano", "multi_head_attention"]
