from .session import get_spark
from .registry import ModelRegistry, Runner, ExecutionContext

__all__ = ["get_spark", "ModelRegistry", "Runner", "ExecutionContext"]
