"""TPU-native serving: batched inference engine + HTTP front end."""
from .engine import InferenceEngine

__all__ = ["InferenceEngine"]
