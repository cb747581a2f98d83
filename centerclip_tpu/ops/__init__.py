# coding=utf-8
from .distances import pairwise_distance, squared_l2_distance, cosine_distance
from .kmedoids import (batch_fast_kmedoids, batch_fast_kmedoids_with_split,
                       kkz_init, kmedoids_oracle)
from .spectral import batch_spectral_clustering, spatial_temporal_graph
from .shift import temporal_shift_wo_cls, token_shift
from .cluster_layer import TokenClusterInter, video_mask_after_cluster
from .sampling import multi_segments_sampling, uniform_sampling
