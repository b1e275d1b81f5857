from multithreading_string_matching_tpu.utils.timing import PhaseTimer
from multithreading_string_matching_tpu.utils.report import format_report

__all__ = ["PhaseTimer", "format_report"]
