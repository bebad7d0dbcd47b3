from luciddreamer_tpu.utils.profiling import PhaseTimer, trace_to
from luciddreamer_tpu.utils.visibility import mark_visible

__all__ = ["PhaseTimer", "trace_to", "mark_visible"]
