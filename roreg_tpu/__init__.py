"""roreg_tpu: a TPU-native (JAX/XLA/Pallas) point-cloud registration framework.

Re-implements the full capability surface of RoReg (TPAMI 2023) — sparse-conv
FCGF backbone features under the 60-element icosahedral rotation group,
group-equivariant RoReg-Desc descriptors (GF), rotation-guided detection (RD),
rotation-coherence matching (RM), and one-shot local-rotation transformation
estimation (ET) with on-device vectorized RANSAC — designed TPU-first:
static shapes, MXU-friendly contractions, pjit/shard_map distribution.

Reference layer map: /root/reference (see SURVEY.md). Nothing is ported;
semantics are reproduced with property tests.
"""

__version__ = "0.1.0"
