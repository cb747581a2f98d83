# coding=utf-8
from .decode import VideoDecoder, HAS_PYAV, HAS_LMDB
from .loader import BatchLoader, collate
from .registry import DATALOADER_DICT
from .framestore import FrameStore, FrameStoreWriter, build_framestore
