from u2seg_tpu.utils import analysis, env, logger, memory, tracking, visualizer

__all__ = ["analysis", "env", "logger", "memory", "tracking", "visualizer"]
