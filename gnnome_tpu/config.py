"""Typed configuration for gnnome_tpu.

Replaces the reference's three-part untyped config (argparse per script +
``configs/hyperparameters.py`` dict + ``configs/config.py`` dict; see SURVEY.md §5
"Config/flag system").  Defaults reproduce the reference's shipped values
(reference configs/hyperparameters.py:3-52, configs/config.py:1-14).
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class ModelConfig:
    """Model hyperparameters (reference configs/hyperparameters.py:20-29)."""
    model: str = "sym_gatedgcn"       # sym_gatedgcn | gatedgcn | gcn | gat | sage
    dim_latent: int = 64
    num_gnn_layers: int = 8
    node_features: int = 2
    edge_features: int = 2            # 2 with overlap similarity, 1 without
    hidden_ne_features: int = 16
    hidden_edge_scores: int = 64
    normalization: str = "batch"      # batch | layer | none
    dropout: float = 0.2
    directed: bool = True             # zoo variants only (reference models/full_graph.py:34)
    gat_num_heads: int = 3            # reference layers/processor.py:49


@dataclass
class DataConfig:
    """Featurization + data generation (reference configs/hyperparameters.py:17, config.py:12-13)."""
    use_similarities: bool = True
    sequencing_depth: int = 60
    sample_profile_id: str = "20kb-m64011_190830_220126"
    sample_file: str = ""


@dataclass
class TrainConfig:
    """Training knobs (reference configs/hyperparameters.py:32-42)."""
    num_epochs: int = 5
    lr: float = 1e-4
    use_symmetry_loss: bool = True
    alpha: float = 0.1                 # symmetry-loss weight
    num_nodes_per_cluster: int = 1000  # partition graphs larger than this
    k_extra_hops: int = 1              # halo size for cluster training
    patience: int = 2                  # plateau-scheduler patience
    decay: float = 0.95                # plateau-scheduler factor
    masking: bool = True
    mask_frac_low: int = 80            # % of nodes kept (low end)
    mask_frac_high: int = 100
    seed: int = 1
    device: str = "tpu"


@dataclass
class DecodeConfig:
    """Greedy decoding (reference configs/hyperparameters.py:45-51, inference.py:25-28)."""
    strategy: str = "greedy"
    num_decoding_paths: int = 100
    decode_with_labels: bool = False
    load_checkpoint: bool = True
    num_threads: int = 32
    len_threshold: int = 70_000
    random_baseline: bool = False      # reference inference.py RANDOM flag
    early_stopping: bool = False       # reference inference.py early_stopping flag
    p_threshold: float = 0.06


@dataclass
class PathsConfig:
    """Tool/asset locations (reference configs/config.py:1-14)."""
    checkpoints_path: str = "checkpoints"
    models_path: str = "checkpoints"
    tool_dir: str = "vendor"
    raven_dir: str = "vendor/raven-1.8.1"
    hifiasm_dir: str = "vendor/hifiasm-0.18.8"
    pbsim3_dir: str = "vendor/pbsim3"
    minigraph: str = "minigraph"       # configurable (reference hardcodes user paths, utils/evaluate.py:140)
    paftools: str = "paftools.js"


@dataclass
class ComputeConfig:
    """TPU execution knobs (no reference equivalent — the reference is single-GPU/CPU)."""
    device: str = "auto"               # auto | tpu | cpu : jax platform selection
    mesh: int = 0                      # >1: shard inference over N devices
    backend: str = "auto"              # auto | xla | pallas : message-passing kernel backend
    dtype: str = "float32"             # float32 | bfloat16 : compute dtype for the GNN hot path
    matmul_precision: str = "highest"  # "highest" for fp32 parity, "default" for bf16-accelerated
    edge_pad_multiple: int = 512       # pad edge arrays to this multiple for static shapes
    node_pad_multiple: int = 128
    bucket_growth: float = 1.2         # geometric shape-bucket rounding for
                                       # masked/clustered training units (and
                                       # halo plans): rounds padded sizes up to
                                       # powers of this factor so one epoch
                                       # compiles a bounded number of programs;
                                       # <=1 disables
    remat: object = True               # False | True (per-layer) | "full"
                                       # ("full" also rematerialises the layer
                                       # carries — multi-million-edge graphs)
    scheduler: str = "auto"            # auto | latency | memory : XLA op
                                       # scheduler.  "memory" disables the
                                       # latency-hiding scheduler (shorter
                                       # buffer live ranges, less HBM
                                       # fragmentation); "auto" = memory when
                                       # remat == "full", else latency
    donate_state: bool = True


def resolve_backend(compute: "ComputeConfig") -> str:
    """Concrete kernel backend for ``backend='auto'``: the Pallas windowed
    kernels on a real TPU, the XLA segment-sum path elsewhere.  The probe
    matches the device *platform string* against {'tpu', 'axon'} — tunneled
    TPUs register as 'axon', not 'tpu', so a default_backend()=='tpu' check
    silently resolved to XLA on this project's own hardware (round-5 fix;
    same probe as tests_tpu/conftest.py and bench.py)."""
    if compute.backend != "auto":
        return compute.backend
    try:
        import jax
        plat = jax.devices()[0].platform.lower()
        return "pallas" if plat in ("tpu", "axon") else "xla"
    except Exception:
        return "xla"


def with_resolved_backend(cfg: "Config") -> "Config":
    """Copy of ``cfg`` whose ``compute.backend`` is concrete.

    Never mutates the caller's config: a shared cfg resolved once on CPU must
    not stay pinned to 'xla' for later calls on other platforms (advisor
    finding, round 4)."""
    backend = resolve_backend(cfg.compute)
    if backend == cfg.compute.backend:
        return cfg
    out = dataclasses.replace(cfg)
    out.compute = dataclasses.replace(cfg.compute, backend=backend)
    return out


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    decode: DecodeConfig = field(default_factory=DecodeConfig)
    paths: PathsConfig = field(default_factory=PathsConfig)
    compute: ComputeConfig = field(default_factory=ComputeConfig)
    wandb_mode: str = "disabled"
    wandb_project: str = "gnnome-tpu"

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        cfg = cls()
        for section, values in d.items():
            if not hasattr(cfg, section):
                raise KeyError(f"Unknown config section: {section}")
            cur = getattr(cfg, section)
            if dataclasses.is_dataclass(cur) and isinstance(values, dict):
                for k, v in values.items():
                    if not hasattr(cur, k):
                        raise KeyError(f"Unknown config key: {section}.{k}")
                    setattr(cur, k, v)
            else:
                setattr(cfg, section, values)
        return cfg

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    def apply_overrides(self, overrides: list[str]) -> "Config":
        """Apply ``section.key=value`` CLI overrides (highest precedence,
        mirroring the reference's CLI-arg > dict precedence, train.py:243-244)."""
        for ov in overrides:
            key, _, raw = ov.partition("=")
            section, _, attr = key.partition(".")
            if not attr:
                raise KeyError(f"Override must be section.key=value: {ov}")
            if not hasattr(self, section):
                raise KeyError(
                    f"Unknown config section '{section}' in --set {ov}; "
                    f"sections: {[f.name for f in dataclasses.fields(self)]}")
            target = getattr(self, section)
            if not hasattr(target, attr):
                raise AttributeError(
                    f"Unknown config key '{section}.{attr}' in --set {ov}; "
                    f"keys: {[f.name for f in dataclasses.fields(target)]}")
            old = getattr(target, attr)
            if isinstance(old, bool):
                if raw.lower() in ("1", "true", "yes"):
                    val = True
                elif raw.lower() in ("0", "false", "no"):
                    val = False
                else:
                    val = raw  # extended modes, e.g. compute.remat=full
            elif isinstance(old, int):
                val = int(raw)
            elif isinstance(old, float):
                val = float(raw)
            else:
                val = raw
            setattr(target, attr, val)
        return self


def get_config() -> Config:
    return Config()
