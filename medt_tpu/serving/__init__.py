"""TPU-native serving: batched inference engine + HTTP front end."""
from .engine import InferenceEngine, QueueFullError

__all__ = ["InferenceEngine", "QueueFullError"]
