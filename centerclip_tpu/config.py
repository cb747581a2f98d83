## coding=utf-8
"""Typed configuration tree for centerclip-tpu.

Replaces the reference's argparse flag surface (reference: params.py:19-326)
with frozen dataclasses so every config is hashable and usable as a static
argument under `jax.jit`.  A CLI bridge (`parse_args`) keeps flag-level parity
with the reference scripts, and `save_hparams` keeps the `hparams_train.json`
snapshot format (reference: params.py:329-335).
"""
from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

# ---------------------------------------------------------------------------
# Per-CLIP-variant optimizer defaults (reference: params.py:9-16)
# ---------------------------------------------------------------------------
CLIP_DEFAULT_PARAMS = {
    "RN50": {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.999, "eps": 1.0e-8},
    "RN101": {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.999, "eps": 1.0e-8},
    "RN50x4": {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.999, "eps": 1.0e-8},
    "ViT-B/32": {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.98, "eps": 1.0e-6},
    "ViT-B/16": {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.98, "eps": 1.0e-6},
}

# Architecture table for the supported CLIP variants; the reference infers
# these from pretrained state-dict shapes (reference: modules/clip.py:554-577).
# We make them explicit so a model can be built without any weight file.
CLIP_ARCHS = {
    "ViT-B/32": dict(embed_dim=512, image_resolution=224, vision_layers=12,
                     vision_width=768, vision_patch_size=32, context_length=77,
                     vocab_size=49408, transformer_width=512,
                     transformer_heads=8, transformer_layers=12),
    "ViT-B/16": dict(embed_dim=512, image_resolution=224, vision_layers=12,
                     vision_width=768, vision_patch_size=16, context_length=77,
                     vocab_size=49408, transformer_width=512,
                     transformer_heads=8, transformer_layers=12),
    # ResNet variants: tuple vision_layers selects the ModifiedResNet tower.
    # Support level mirrors the reference, whose weight loader rejects RN
    # checkpoints (clip.py:650-653): buildable + inference, no cluster hooks.
    "RN50": dict(embed_dim=1024, image_resolution=224,
                 vision_layers=(3, 4, 6, 3), vision_width=64,
                 vision_patch_size=None, context_length=77, vocab_size=49408,
                 transformer_width=512, transformer_heads=8,
                 transformer_layers=12),
    "RN101": dict(embed_dim=512, image_resolution=224,
                  vision_layers=(3, 4, 23, 3), vision_width=64,
                  vision_patch_size=None, context_length=77, vocab_size=49408,
                  transformer_width=512, transformer_heads=8,
                  transformer_layers=12),
}


@dataclass(frozen=True)
class ClusterConfig:
    """Token-clustering configuration.

    Mirrors the cluster flag block of the reference (params.py:192-282) and the
    constructor of TokenClusterInter (modules/cluster/cluster.py:66-152).
    """
    inter: bool = False                       # --cluster_inter
    algo: str = "kmediods++"                  # --cluster_algo
    # per-transformer-block cluster count / target frame count
    cluster_num_blocks: Tuple[int, ...] = ()  # --cluster_num_blocks
    target_frames_blocks: Tuple[int, ...] = ()  # --target_frames_blocks
    distance: str = "euclidean"               # --cluster_distance
    threshold: float = 1e-5                   # --cluster_threshold
    iter_limit: int = 100                     # --cluster_iter_limit
    minkowski_p: float = 2.0                  # --minkowski_norm_p
    aggregation: Optional[str] = None         # --aggregation (None | 'mean')
    pre_norm: bool = False                    # --pre_norm
    id_sort: bool = True
    # spectral clustering
    spectral_sigma: float = 2.0               # --spectral_sigma
    spectral_graph: str = "HeatKernel"        # --spectral_graph
    spectral_knn_k: int = 1                   # --spectral_knn_k
    spectral_spg: bool = False                # --spectral_spg
    svd_correct_sign: bool = True             # --svd_correct_sign
    # eigen-solver: 'eigh' (exact) or 'subspace' (MXU-shaped subspace
    # iteration, ~5x faster on TPU)
    spectral_solver: str = "eigh"
    # learned extras
    cluster_embedding: bool = False           # --cluster_embedding
    cluster_embed_from_clip: bool = True      # --cluser_embed_from_clip
    cluster_frame_embedding: bool = False     # --cluster_frame_embedding
    adaptive_cls: bool = False                # --adaptive_cls
    # deep cluster (experimental learned clustering head)
    deep_cluster: bool = False                # --deep_cluster
    cluster_inter_dim: int = 256              # --cluster_inter_dim

    def __post_init__(self):
        assert self.algo in ("kmediods++", "pooling", "sparse_sampling",
                             "spectral", "temporal_shift", "token_shift")
        assert self.distance in ("euclidean", "cosine")
        assert self.spectral_graph in ("HeatKernel", "KNN")
        assert not (self.deep_cluster and self.inter), \
            "deep_cluster and cluster_inter are mutually exclusive (params.py:287)"


@dataclass(frozen=True)
class BlockClusterSpec:
    """Static shape plan for the clustering module inserted before one
    transformer block (resolved version of get_cluster_inter,
    reference: modules/cluster/cluster.py:15-63)."""
    block_id: int                 # 1-based transformer block index
    algo: str
    before_cluster_num: int       # tokens per frame entering the block (w/o CLS)
    cluster_num: int              # medoid tokens per segment leaving the block
    before_frames: int
    after_frames: int
    frame_duration: int           # before_frames // after_frames
    spectral_knn_k: int = 0
    spg_s_kernel: int = 0         # spatial kernel for spatial-temporal graph
    spg_t_kernel: int = 0

    @property
    def tokens_in(self) -> int:
        return self.before_cluster_num * self.frame_duration

    @property
    def tokens_out(self) -> int:
        return self.cluster_num


def build_cluster_plan(cluster: ClusterConfig, max_frames: int,
                       num_layers: int) -> Tuple[Optional[BlockClusterSpec], ...]:
    """Resolve which blocks get a cluster module and with which static shapes.

    Decision rule (reference: modules/cluster/cluster.py:23-37): block *i*
    (1-based) clusters iff its configured cluster count > 1 AND either the
    frame count or the cluster count shrinks relative to block *i-1*.
    """
    if not cluster.inter:
        return tuple(None for _ in range(num_layers))
    assert len(cluster.cluster_num_blocks) == num_layers, \
        f"cluster_num_blocks must have {num_layers} entries"
    assert len(cluster.target_frames_blocks) == num_layers

    tfb = (max_frames,) + tuple(cluster.target_frames_blocks)
    plan = []
    for block_id in range(1, num_layers + 1):
        cluster_num = cluster.cluster_num_blocks[block_id - 1]
        before_cluster_num = cluster.cluster_num_blocks[max(block_id - 2, 0)]
        after_frames = tfb[block_id]
        before_frames = tfb[block_id - 1]
        is_cluster = (cluster_num is not None and cluster_num > 1) and (
            before_frames > after_frames or before_cluster_num > cluster_num)
        if not is_cluster:
            plan.append(None)
            continue
        frame_duration = before_frames // after_frames
        # adaptive KNN K (reference: cluster.py:145-150)
        if cluster.spectral_knn_k < 5:
            knn_k = int(5 * frame_duration) if before_cluster_num < 100 \
                else int(5 * frame_duration + 5)
        else:
            knn_k = cluster.spectral_knn_k
        # spatial-temporal graph kernels (reference: cluster.py:174-178)
        s_kernel = 9 if before_cluster_num < 100 else 19
        plan.append(BlockClusterSpec(
            block_id=block_id, algo=cluster.algo,
            before_cluster_num=before_cluster_num, cluster_num=cluster_num,
            before_frames=before_frames, after_frames=after_frames,
            frame_duration=frame_duration, spectral_knn_k=knn_k,
            spg_s_kernel=s_kernel if cluster.spectral_spg else 0,
            spg_t_kernel=7 if cluster.spectral_spg else 0))
    return tuple(plan)


@dataclass(frozen=True)
class ModelConfig:
    """CLIP4Clip model configuration (reference: modules/clip4clip.py:127-197)."""
    clip_name: str = "ViT-B/32"               # --pretrained_clip_name
    sim_header: str = "meanP"                 # --sim_header
    loose_type: bool = True                   # --loose_type
    linear_patch: str = "2d"                  # --linear_patch
    max_words: int = 32                       # --max_words
    max_frames: int = 12                      # --max_frames
    cross_num_hidden_layers: int = 4          # --cross_num_hidden_layers
    cross_model_name: str = "cross-base"      # --cross_model (archive ref)
    temperature_new: float = 1.0              # --temperature_new
    pre_visual_pooling: bool = False          # derived (params.py:291-293)
    # tightTransf memory valve (reference clip4clip.py:377-391 `step_size`):
    # score the all-pairs cross model `cross_chunk_size` text rows at a time
    # so the [chunk*bv, L, D] block stays bounded on big eval galleries.
    # 0 = single block (reference default step_size = b_text).
    cross_chunk_size: int = 0
    cluster: ClusterConfig = field(default_factory=ClusterConfig)
    # compute dtype for the transformer towers; fp32 is forced for layer norm,
    # softmax, clustering and the similarity head regardless of this setting
    compute_dtype: str = "bfloat16"
    # rematerialize transformer blocks on backward (jax.checkpoint): trades
    # ~30% extra FLOPs for O(layers) -> O(1) activation memory — the TPU
    # answer to the ActivityNet 60-75-frame OOM configs the reference handles
    # with 8-32 GPUs (README.md:86, scripts/activitynet.sh:90)
    remat: bool = False
    # fused Pallas attention kernel for the (eval/encode) tower forwards.
    # XLA's attention lowering at CLIP's tiny sequence lengths is copy-bound
    # (~25% of the encode step in layout copies on v5e); the kernel keeps
    # logits/softmax in VMEM.  It carries a tested custom VJP, but measured
    # end-to-end the train step is faster on the XLA path (see
    # ops/attention_pallas.py crossover table), so training and non-TPU
    # backends use XLA.
    fused_attention: bool = True
    # Megatron-style sequence parallelism: under tensor parallelism
    # (tensor_parallel > 1) additionally shard the transformer residual
    # stream on the token axis over the model mesh axis, cutting the
    # LN/residual activation memory per chip by 1/tp and turning the TP
    # boundary all-reduces into all-gather/reduce-scatter pairs (same
    # bytes, less live memory).  Training-only effect: eval encoders trace
    # outside a mesh context so the constraint no-ops there.  See
    # parallel/mesh.py::shard_tokens.
    sequence_parallel: bool = False
    # GPipe pipeline parallelism: split the transformer block stacks into
    # `pipeline_parallel` stages over a (data, pipe) mesh, microbatch the
    # rows, and flow activations stage-to-stage over ICI on a static
    # lax.scan schedule (parallel/pipeline.py).  Mutually exclusive with
    # tensor_parallel.  Training-only effect (eval traces outside a mesh
    # context and keeps the sequential loop); checkpoint schema unchanged.
    pipeline_parallel: int = 1
    # GPipe microbatch count M (bubble = (S-1)/(M+S-1)); 0 = one per stage
    pipeline_microbatches: int = 0

    def __post_init__(self):
        assert self.clip_name in CLIP_ARCHS, f"unknown CLIP variant {self.clip_name}"
        assert self.sim_header in ("meanP", "seqLSTM", "seqTransf", "tightTransf")
        assert self.linear_patch in ("2d", "3d")
        if self.sim_header == "tightTransf":
            assert not self.loose_type

    @property
    def arch(self) -> dict:
        return CLIP_ARCHS[self.clip_name]

    @property
    def final_frames(self) -> int:
        # reference: clip4clip.py:156 reads target_frames_blocks[-1] whenever
        # either clustering flavour is configured
        if (self.cluster.inter or self.cluster.deep_cluster) \
                and self.cluster.target_frames_blocks:
            return self.cluster.target_frames_blocks[-1]
        return self.max_frames

    @property
    def f_frame_duration(self) -> int:
        # reference: clip4clip.py:156-157
        return self.max_frames // self.final_frames

    def cluster_plan(self) -> Tuple[Optional[BlockClusterSpec], ...]:
        return build_cluster_plan(self.cluster, self.max_frames,
                                  self.arch["vision_layers"])

    @property
    def cluster_split_size(self) -> int:
        # reference: cluster.py:56 — only relevant to the torch impl's memory
        # chunking; kept for config parity (the TPU kernels do not need it).
        return 4 if self.clip_name == "ViT-B/16" else 16


@dataclass(frozen=True)
class DataConfig:
    """Dataset / pipeline configuration (reference: params.py:35-52,55-87)."""
    datatype: str = "msrvtt"                  # --datatype
    data_dir: str = ""                        # --data_dir
    train_csv: str = ""                       # --train_csv
    val_csv: str = ""                         # --val_csv
    data_path: str = ""                       # --data_path
    features_path: str = ""                   # --features_path
    lmdb_dataset: Optional[str] = None        # --lmdb_dataset
    num_thread_reader: int = 1                # --num_thread_reader
    feature_framerate: int = 1                # --feature_framerate (fps)
    max_words: int = 32
    max_frames: int = 12
    slice_framepos: int = 2                   # --slice_framepos
    train_frame_order: int = 0                # --train_frame_order
    eval_frame_order: int = 0                 # --eval_frame_order
    expand_msrvtt_sentences: bool = False     # --expand_msrvtt_sentences
    image_resolution: int = 224
    video_suffix: str = ".mp4"                # .mp4 | .npy | framestore keys
    # ship raw cropped uint8 pixels and normalise on device (4x less
    # host->device traffic); False restores host-side float32 normalisation
    raw_pixels: bool = True


@dataclass(frozen=True)
class OptimConfig:
    """Optimizer / schedule configuration (reference: params.py:62-114)."""
    optim: str = "BertAdam"                   # --optim ('BertAdam'|'AdamW')
    lr: float = 5e-4                          # --lr
    coef_lr: float = 1.0                      # --coef_lr (CLIP-param multiplier)
    beta1: float = 0.9
    beta2: float = 0.98
    eps: float = 1e-6
    weight_decay: float = 0.2                 # --wd
    warmup_proportion: float = 0.1            # --warmup_proportion
    schedule: str = "warmup_cosine"           # BertAdam schedule
    lr_mode: str = "cos"                      # AdamW lr_scheduler mode
    clip_grad_norm: float = 1.0               # --clip_grad_norm
    gradient_accumulation_steps: int = 1      # --gradient_accumulation_steps
    end_lr: float = 1e-8


@dataclass(frozen=True)
class RunConfig:
    """Top-level run configuration: the analogue of the reference's parsed
    argparse namespace (params.py:19-326)."""
    do_train: bool = True
    do_eval: bool = False
    inference_speed_test: bool = False
    output_dir: str = "output"
    resume: Optional[str] = None
    load_from_pretrained: bool = False
    init_model: Optional[str] = None
    pretrained_dir: str = os.path.expanduser("~/models/pretrained")
    epochs: int = 5
    batch_size: int = 128                     # global batch
    batch_size_val: int = 128
    seed: int = 42
    n_display: int = 100
    freeze_layer_num: int = 0
    freeze_clip: bool = False
    precision: str = "bf16"                   # amp|fp16|fp32 -> bf16|fp32 on TPU
    profile_dir: Optional[str] = None         # --profile_dir (XLA trace)
    profile_steps: int = 5
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    # parallelism: number of data-parallel shards; <=0 means "all devices"
    data_parallel: int = 0
    # model-axis shards (Megatron-style column/row-parallel transformer
    # weights over a 2-D (data, model) mesh; 1 = pure data parallel, the
    # reference's only mode).  See parallel/mesh.py::param_shardings.
    tensor_parallel: int = 1
    # ZeRO-style sharding of params + fp32 Adam moments over the data
    # axis (composable with tensor_parallel); frees HBM for bigger
    # towers/batches at the cost of per-layer weight all-gathers.
    fsdp: bool = False

    # names treated as new-added (non-CLIP lr group) even when nested under
    # the clip tower (reference: params.py:314)
    @property
    def new_added_modules(self) -> Tuple[str, ...]:
        return ("time_embedding", "frame_embedding", "deepcluster")


def to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def save_hparams(directory: str, cfg: RunConfig) -> str:
    """JSON snapshot, format-compatible with hparams_train.json
    (reference: params.py:329-335)."""
    os.makedirs(directory, exist_ok=True)
    filename = os.path.join(directory, "hparams_train.json")
    with open(filename, "w") as f:
        json.dump(to_dict(cfg), f, indent=4, sort_keys=True, default=str)
    return filename


def _replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


def make_run_config(**kw) -> RunConfig:
    """Build a RunConfig from flat flag-style keywords (CLI bridge).

    Applies the same derivations the reference performs post-parse
    (params.py:286-321): tightTransf forces loose_type off, ActivityNet turns
    on eval-time pre-pooling, per-variant lr/beta defaults.
    """
    model_kw, data_kw, optim_kw, cluster_kw, run_kw = {}, {}, {}, {}, {}
    model_fields = {f.name for f in dataclasses.fields(ModelConfig)}
    data_fields = {f.name for f in dataclasses.fields(DataConfig)}
    optim_fields = {f.name for f in dataclasses.fields(OptimConfig)}
    cluster_fields = {f.name for f in dataclasses.fields(ClusterConfig)}
    run_fields = {f.name for f in dataclasses.fields(RunConfig)}
    for k, v in kw.items():
        if k in cluster_fields:
            cluster_kw[k] = v
        elif k in model_fields:
            model_kw[k] = v
        elif k in data_fields:
            data_kw[k] = v
        elif k in optim_fields:
            optim_kw[k] = v
        elif k in run_fields:
            run_kw[k] = v
        else:
            raise TypeError(f"unknown config field: {k}")
    # shared fields flow into both model and data configs
    for shared in ("max_words", "max_frames"):
        if shared in model_kw:
            data_kw.setdefault(shared, model_kw[shared])

    cluster = ClusterConfig(**cluster_kw)
    model_kw["cluster"] = cluster
    # sim_header derivation (params.py:289-290)
    if model_kw.get("sim_header") == "tightTransf":
        model_kw["loose_type"] = False
    # ActivityNet pre-pooling (params.py:291-293)
    if data_kw.get("datatype") == "activity":
        model_kw.setdefault("pre_visual_pooling", True)
    # tensor parallelism shards the attention weights over the model mesh
    # axis; the Pallas kernel is a single-device program (no manual
    # partitioning spec), so the towers must take the XLA attention path,
    # which GSPMD partitions automatically
    if run_kw.get("tensor_parallel", 1) > 1:
        model_kw["fused_attention"] = False
        if model_kw.get("pipeline_parallel", 1) > 1:
            raise ValueError("pipeline_parallel and tensor_parallel cannot "
                             "be combined on one mesh")
    elif model_kw.get("sequence_parallel"):
        raise ValueError(
            "sequence_parallel shards tokens over the model mesh axis and "
            "therefore requires tensor_parallel > 1")
    if model_kw.get("pipeline_parallel", 1) > 1:
        # the Pallas kernel is a single-device program; inside the GPipe
        # shard_map it would lower per-stage, but routing stays uniform
        # (and CPU-mesh-testable) on the XLA attention path
        model_kw["fused_attention"] = False
    model = ModelConfig(**model_kw)

    # per-variant optimizer defaults (params.py:317-321)
    defaults = CLIP_DEFAULT_PARAMS.get(model.clip_name, {})
    for name, val in defaults.items():
        optim_kw.setdefault(name, val)
    optim = OptimConfig(**optim_kw)
    data = DataConfig(**data_kw)
    return RunConfig(model=model, data=data, optim=optim, **run_kw)


# ---------------------------------------------------------------------------
# Canonical per-dataset presets (reference: scripts/*.sh case blocks)
# ---------------------------------------------------------------------------
def preset(name: str, **overrides) -> RunConfig:
    """Named experiment presets matching the reference's script configs."""
    presets = {
        # scripts/msrvtt.sh:78-93 (eclip_msrvtt_62): ViT-B/32 kmediods++ 12->6
        "msrvtt_vitb32_k6": dict(
            datatype="msrvtt", clip_name="ViT-B/32", sim_header="meanP",
            max_words=32, max_frames=12, expand_msrvtt_sentences=True,
            inter=True, algo="kmediods++",
            cluster_num_blocks=(49,) * 12,
            target_frames_blocks=(12,) * 6 + (6,) * 6,
            optim="AdamW", lr=2e-3, coef_lr=1e-3, weight_decay=0.2, epochs=5),
        # scripts/msrvtt.sh:94-108 (eclip_msrvtt_63): 12->4
        "msrvtt_vitb32_k4": dict(
            datatype="msrvtt", clip_name="ViT-B/32", sim_header="meanP",
            max_words=32, max_frames=12, expand_msrvtt_sentences=True,
            inter=True, algo="kmediods++",
            cluster_num_blocks=(49,) * 12,
            target_frames_blocks=(12,) * 6 + (4,) * 6,
            optim="AdamW", lr=2e-3, coef_lr=1e-3, weight_decay=0.2, epochs=5),
        # scripts/lsmdc.sh:90-103 (lsmdc_04): ViT-B/32 kmediods++ 12->6
        "lsmdc_vitb32_k6": dict(
            datatype="lsmdc", clip_name="ViT-B/32", sim_header="meanP",
            max_words=32, max_frames=12,
            inter=True, algo="kmediods++",
            cluster_num_blocks=(49,) * 12,
            target_frames_blocks=(12,) * 6 + (6,) * 6,
            optim="AdamW", lr=2e-3, coef_lr=1e-3, weight_decay=0.2, epochs=5),
        # scripts/lsmdc.sh:127-140 (lsmdc_22): spectral-KNN 12->6
        "lsmdc_vitb32_spectral6": dict(
            datatype="lsmdc", clip_name="ViT-B/32", sim_header="meanP",
            max_words=32, max_frames=12,
            inter=True, algo="spectral", spectral_graph="KNN",
            cluster_num_blocks=(49,) * 12,
            target_frames_blocks=(12,) * 6 + (6,) * 6,
            optim="AdamW", lr=2e-3, coef_lr=1e-3, weight_decay=0.2, epochs=5),
        # scripts/msvd.sh:72-83 (msvd_22): kmediods++ 12->4
        "msvd_vitb32_k4": dict(
            datatype="msvd", clip_name="ViT-B/32", sim_header="meanP",
            max_words=32, max_frames=12,
            inter=True, algo="kmediods++",
            cluster_num_blocks=(49,) * 12,
            target_frames_blocks=(12,) * 6 + (4,) * 6,
            optim="AdamW", lr=2e-3, coef_lr=1e-3, weight_decay=0.2, epochs=5),
        # scripts/activitynet.sh:29-68: paragraph retrieval, 60 frames
        "activity_vitb32": dict(
            datatype="activity", clip_name="ViT-B/32", sim_header="meanP",
            max_words=77, max_frames=60,
            inter=True, algo="kmediods++",
            cluster_num_blocks=(49,) * 12,
            target_frames_blocks=(60,) * 6 + (15,) * 6,
            optim="AdamW", lr=2e-3, coef_lr=1e-3, weight_decay=0.2, epochs=8),
        # ViT-B/16 MSR-VTT (stress config for the distance kernels)
        "msrvtt_vitb16_k6": dict(
            datatype="msrvtt", clip_name="ViT-B/16", sim_header="meanP",
            max_words=32, max_frames=12, expand_msrvtt_sentences=True,
            inter=True, algo="kmediods++",
            cluster_num_blocks=(196,) * 6 + (160,) * 6,
            target_frames_blocks=(12,) * 6 + (6,) * 6,
            optim="AdamW", lr=2e-3, coef_lr=1e-3, weight_decay=0.2, epochs=5),
    }
    if name not in presets:
        raise KeyError(f"unknown preset {name}; available: {sorted(presets)}")
    cfg = dict(presets[name])
    cfg.update(overrides)
    return make_run_config(**cfg)
