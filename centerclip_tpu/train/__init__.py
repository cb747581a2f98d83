# coding=utf-8
from .metrics import (compute_metrics, tensor_text_to_video_metrics,
                      tensor_video_to_text_sim, reshape_multi_sentence_sim,
                      AverageMeter)
from .optim import build_optimizer, current_lr
from .state import TrainState, save_checkpoint, load_checkpoint, resume
from .loop import Trainer, make_train_step
from .evaluate import Evaluator
