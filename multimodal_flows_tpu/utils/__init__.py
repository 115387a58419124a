from multimodal_flows_tpu.utils.logger import MetricsLogger, SimpleLogger

__all__ = ["MetricsLogger", "SimpleLogger"]
