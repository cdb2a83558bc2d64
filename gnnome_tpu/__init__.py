"""gnnome_tpu — a TPU-native geometric-deep-learning framework for de novo genome assembly.

Re-designed from scratch for JAX/XLA/Pallas on TPU, with the capabilities of the
reference GNNome pipeline (OLC assembly-graph construction -> GNN edge scoring ->
greedy decoding -> contig FASTA).  See SURVEY.md for the component map.

Sub-packages
------------
graphs    CPU-side graph containers (CSR/COO), GFA parsing, ground-truth labels,
          partitioning, synthetic-graph generation.
ops       TPU compute primitives: gated SDDMM/SpMM (XLA + Pallas backends) with
          custom VJPs.
models    SymGatedGCN model family in functional JAX (+ torch weight conversion).
train     jit'd training step, losses, metrics, LR scheduling, checkpointing.
decode    greedy path decoding over CSR + assembly FASTA emission + N50/NG50.
parallel  device meshes, edge-partitioned multi-chip execution (shard_map).
data      dataset directory layout, read simulation, train/valid splitting,
          external-tool installation.
utils     FASTA/Q I/O, seeding, timing, logging.
"""

__version__ = "0.1.0"
