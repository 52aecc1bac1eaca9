from .order_pipeline import OrderPipelineResult, order_webhook_pipeline
from .process_pipeline import STATUS_MAP, ProcessPipelineResult, process_webhook_pipeline

__all__ = [
    "OrderPipelineResult",
    "order_webhook_pipeline",
    "STATUS_MAP",
    "ProcessPipelineResult",
    "process_webhook_pipeline",
]
