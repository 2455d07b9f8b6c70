"""Single typed config tree for the inference pipeline.

Replaces the reference's five near-duplicate argparse modules
(``parses/parses_*.py``) and the magic constants buried in code
(coor_norm_step at rot_coh_match.py:328, NMS k=5 at test/matcher.py:50).
Defaults reproduce the paper's 3DMatch evaluation settings
(Test.py:7-17, README.md:141-177).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # geometry
    voxel_size: float = 0.025
    group_size: int = 60

    # static capacities (buckets) for the sparse pyramid, finest level first
    capacities: tuple[int, ...] = (32768, 16384, 8192, 4096)
    conv1_kernel_size: int = 7
    backbone_variant: str = "ResUNetBN2C"
    backbone_compute_dtype: str | None = "bfloat16"  # conv gather+MXU dtype

    # how many of the 60 rotations run per jitted backbone pass
    group_chunk: int = 10
    # rotations vmapped TOGETHER through the block engine inside a chunk
    # (must divide group_chunk). MEASURED PESSIMIZATION — keep at 1:
    # vmapping 5 rotations is 1.7x slower/rotation under the round-3
    # engine and 1.24x under the dense-conv1 engine (re-measured round 5,
    # scripts/experiment_rot_vmap.py: 83.4 vs 67.5 ms/rotation at bench
    # caps) — batching worsens XLA's gather lowering more than it
    # amortizes per-kernel overheads. The knob stays for future engines.
    rot_vmap: int = 1
    # backbone execution engine:
    #   "block"  — block-dense micro-block engine (sparse/block.py): coarse
    #              contiguous gathers + dense MXU convs; the production
    #              inference fast path.
    #   "gather" — row-gather engine (sparse/conv.py): differentiable,
    #              used for training and as the parity oracle.
    engine: str = "block"
    # static per-level block capacities for the block engine (4^3 cells
    # per block); overflow drops blocks LOUDLY (native/blockpyr.py)
    block_caps: tuple[int, ...] = (3072, 1024, 512, 256)
    # overflow escape hatch for right-sized block_caps: when a rotation
    # chunk overflows block_caps, the chunk is rebuilt at these (larger)
    # capacities and run through a second compiled program instead of
    # dropping blocks. None disables (overflow then only warns + drops).
    # Compute cost scales ~linearly with caps, so production configs
    # right-size block_caps to the observed p100 and keep a roomy fallback.
    block_caps_fallback: tuple[int, ...] | None = None
    # Pallas windowed-gather conv slab width for the gather engine's
    # inference path (legacy; the block engine supersedes it). None disables.
    conv_window: int | None = None
    # build coordinate pyramids on host (native C++) instead of on device:
    # the ME-style split; ~60x faster map construction, far smaller compiles
    host_maps: bool = True

    # keypoints
    num_keypoints: int = 5000  # keypoints per cloud (3DMatch protocol)
    keynum: int = 1000  # sampled matches for estimation
    nms_k: int = 5  # spatial NMS neighborhood (test/matcher.py:50)

    # matcher
    use_rd: bool = True
    use_rm: bool = True
    # fraction of top RM matches kept for estimation (reference default
    # 0.5, parses_test.py:51); [0.999, 1) = use all, >= 1 = top-n count
    match_n: float = 0.5
    sinkhorn_iters: int = 100
    coor_norm_step: float = 0.025
    # RM blocked-kNN row size for large keynum; None = auto (single GEMM
    # up to 1536 keypoints, 512-row blocks beyond — the long-context
    # blocking that keeps keynum 2500-5000 in memory)
    rm_row_block: int | None = None

    # estimator
    estimator: str = "yohoo"  # or "yohoc"
    max_iter: int = 1000
    ransac_ird: float = 0.1  # inlier distance (ETH: 0.5)

    # scene-level pose-graph synchronization over the pairwise transforms
    # (eval/posegraph.py): cycle-consistent refinement the reference lacks
    pose_sync: bool = False

    # eval thresholds (tau_1/tau_2 from parses_test; RR from evaluator.py:94)
    tau_1: float = 0.05
    tau_2: float = 0.1
    tau_3: float = 0.2
    rr_rot_deg: float = 15.0
    rr_trans: float = 0.3

    # batching
    bs_gf: int = 1250  # GF descriptor batch (parses_test bs_GF)
    bs_et: int = 1000  # ET batch (parses_test bs_ET)
    # pairs registered per batched/sharded pair-stage call; the on-device
    # replacement for the reference's fork-per-pair multiprocessing Pool
    # (test/estimator.py:257-262). With a mesh, must be a multiple of the
    # mesh's data-axis size.
    eval_pair_batch: int = 6
