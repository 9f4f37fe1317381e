from evoworld_tpu.loop.navigator import Navigator, split_curve_into_segments, calculate_segment_indices
from evoworld_tpu.loop.unified import UnifiedLoop, LoopConfig

__all__ = [
    "Navigator",
    "split_curve_into_segments",
    "calculate_segment_indices",
    "UnifiedLoop",
    "LoopConfig",
]
