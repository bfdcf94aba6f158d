from .logger import Logger, Level
from .profiler import Profiler, null_profiler
from .statistics import Statistics

__all__ = ["Logger", "Level", "Profiler", "null_profiler", "Statistics"]
