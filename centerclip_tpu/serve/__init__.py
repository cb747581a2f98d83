# coding=utf-8
"""Online serving: device-resident gallery index + text-query engine."""
from .engine import RetrievalEngine
from .index import VideoIndex

__all__ = ["RetrievalEngine", "VideoIndex"]
