from evoworld_tpu.utils.logging import get_logger
from evoworld_tpu.utils.profiling import phase_timer, trace_context

__all__ = ["get_logger", "phase_timer", "trace_context"]
