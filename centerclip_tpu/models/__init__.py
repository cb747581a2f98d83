# coding=utf-8
from .tokenizer import SimpleTokenizer, tokenize_batch
from .clip import CLIP, TextTransformer, VisionTransformer
