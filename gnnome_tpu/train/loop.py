"""Training loop (reference train.py:188-494).

Same protocol as the reference: per epoch, shuffle graphs; per graph, random
strandwise mask, full-graph or clustered examples, symmetry (or plain BCE)
loss, Adam step per example; epoch metrics averaged over examples; validation
drives best-model selection, a plateau LR scheduler and per-epoch resumable
checkpoints.  ``overfit`` trains and selects on the training set
(train.py:361-372).

Logging: JSONL (always) + optional wandb (config ``wandb_mode='online'``).
Checkpoints: native flat-npz with params/state/optimizer/scheduler/epoch.
"""
from __future__ import annotations

import json
import os
import random
import time
from datetime import datetime

import numpy as np

from ..config import Config
from ..data.dataset import dataset_for
from ..models.checkpoint import save_pytrees, load_pytrees, save_model_weights
from ..models.zoo import get_model
from ..utils.seed import set_seed
from .metrics import compute_metrics, average_epoch_metrics
from .scheduler import ReduceLROnPlateau
from .step import make_steps, prepare_units, set_learning_rate


def _count_params(tree) -> int:
    import jax
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


def _pos_weight_from(ds) -> float:
    """pos_weight = 1 / mean(pos:neg ratio per graph) (train.py:246,258)."""
    ratios = []
    for _, g in ds:
        pos = float((np.round(g.y) == 1).sum())
        neg = float((np.round(g.y) == 0).sum())
        ratios.append(pos / neg if neg else 1.0)
    mean_ratio = sum(ratios) / len(ratios) if ratios else 1.0
    return 1.0 / mean_ratio if mean_ratio else 1.0


class JsonlLogger:
    def __init__(self, path: str, wandb_mode: str = "disabled",
                 wandb_project: str = "", run_name: str = "", config=None):
        self.f = open(path, "a")
        self.wandb = None
        if wandb_mode == "online":
            try:
                import wandb
                self.wandb = wandb.init(project=wandb_project, name=run_name,
                                        config=config)
            except Exception as e:  # wandb optional (train.py:484-486)
                print(f"wandb unavailable: {e}")

    def log(self, data: dict) -> None:
        self.f.write(json.dumps(data) + "\n")
        self.f.flush()
        if self.wandb is not None:
            try:
                self.wandb.log(data)
            except Exception as e:
                print(f"WandB exception occured! {e}")

    def close(self):
        self.f.close()
        if self.wandb is not None:
            self.wandb.finish()


class _HaloRunner:
    """Multi-chip (graph-parallel) unit execution: halo-exchange steps with a
    GSPMD fallback for units that yield no halo plan.  One instance per
    training run so the jitted steps are reused across units/epochs."""

    def __init__(self, cfg, mesh):
        from ..parallel.halo import (make_halo_train_step,
                                     make_halo_eval_step)
        self.cfg = cfg
        self.mesh = mesh
        _, self.train_step = make_halo_train_step(cfg, mesh)
        self.eval_step = make_halo_eval_step(cfg, mesh)

    def replicate(self, tree):
        from ..parallel.sharded import replicate
        return replicate(tree, self.mesh)

    def run_unit(self, unit, params, state, opt_state, pw, rng_key, training):
        """Returns (params, state, opt_state, loss, logits_host) or None when
        the unit has no halo plan (caller falls back to GSPMD)."""
        from ..parallel.halo import (fetch_global, halo_example_from_unit,
                                     halo_scores_to_host)
        hex_ = halo_example_from_unit(self.cfg, self.mesh, unit)
        if hex_ is None:
            return None
        if training:
            params, state, opt_state, loss, logits = self.train_step(
                params, state, opt_state, hex_.plan, hex_.x, hex_.x_rev,
                hex_.labels, pw, rng_key, hex_.scalars)
        else:
            loss, logits = self.eval_step(params, state, hex_.plan, hex_.x,
                                          hex_.x_rev, hex_.labels, pw,
                                          hex_.scalars)
        # fetch_global: np.asarray on a multi-process mesh raises on
        # non-addressable shards
        logits_host = halo_scores_to_host(
            hex_.plan, fetch_global(logits)[..., None], hex_.gt)
        return params, state, opt_state, float(loss), logits_host


def _run_epoch(ds, params, state, opt_state, pos_weight, cfg, rng_np, rng_key,
               train_step, eval_step, training: bool, halo_runner=None):
    import jax
    import jax.numpy as jnp
    from .step import host_units, make_example
    from ..models.zoo import processor_graph_for

    pw = jnp.asarray(pos_weight, dtype=jnp.float32)
    metrics_list = []
    order = list(range(len(ds)))
    if training:
        random.shuffle(order)  # train.py:305
    for i in order:
        _, graph = ds[i]
        for unit in host_units(graph, cfg, rng_np, shuffle_parts=training):
            rng_key, sub = jax.random.split(rng_key)
            logits_np = None
            if halo_runner is not None:
                out = halo_runner.run_unit(unit, params, state, opt_state,
                                           pw, sub, training)
                if out is not None:
                    if training:
                        params, state, opt_state, loss, logits_np = out
                    else:
                        _, _, _, loss, logits_np = out
                    logits_np = logits_np[: unit.y.shape[0]]
            if logits_np is None:
                # single-chip path (or GSPMD fallback when sharded inputs
                # arrive pre-distributed)
                ex = make_example(cfg, unit.in_deg, unit.out_deg, unit.e_feat,
                                  unit.y, unit.src, unit.dst, unit.n_nodes,
                                  bucket_growth=unit.bucket_growth)
                gt_proc = processor_graph_for(
                    cfg.model.model, unit.graph, cfg.model,
                    cfg.compute.edge_pad_multiple,
                    cfg.compute.node_pad_multiple)
                if training:
                    params, state, opt_state, loss, logits = train_step(
                        params, state, opt_state, ex.gt, ex.x, ex.x_rev, ex.e,
                        ex.labels, ex.mask, pw, sub, gt_proc=gt_proc)
                else:
                    loss, logits = eval_step(params, state, ex.gt, ex.x,
                                             ex.x_rev, ex.e, ex.labels,
                                             ex.mask, pw, gt_proc=gt_proc)
                # flagship examples run slot-ordered: pair logits with the
                # identically-permuted labels (metrics are order-invariant).
                # Select by the slot-validity mask, not a prefix — the
                # tail-overflow layout holes the interior slot range
                if ex.slot_io:
                    mk = ex.gt.host("edge_mask")[:, 0] > 0
                    logits_np = np.asarray(logits)[mk]
                    labels_np = np.asarray(ex.labels)[mk]
                else:
                    logits_np = np.asarray(logits)[: ex.n_edges]
                    labels_np = unit.y[: ex.n_edges].astype(np.float32)
                metrics_list.append(compute_metrics(logits_np, labels_np,
                                                    float(loss)))
                continue
            labels_np = unit.y[: logits_np.shape[0]].astype(np.float32)
            metrics_list.append(compute_metrics(logits_np, labels_np,
                                                float(loss)))
    epoch_metrics = average_epoch_metrics(metrics_list) if metrics_list else {}
    return params, state, opt_state, epoch_metrics, rng_key


def train(train_path: str, valid_path: str, assembler: str,
          out_name: str | None = None, overfit: bool = False,
          resume: bool = False, cfg: Config | None = None) -> str:
    """Train the SymGatedGCN edge scorer; returns the best-model path."""
    import jax

    from ..infer import enable_compilation_cache
    enable_compilation_cache()   # same-shape epochs skip recompiles entirely

    from ..config import with_resolved_backend
    cfg = with_resolved_backend(cfg or Config())
    rng_np, rng_key = set_seed(cfg.train.seed)

    timestamp = datetime.now().strftime("%Y-%b-%d-%H-%M-%S")
    out = (out_name or timestamp) + f"_seed{cfg.train.seed}"

    models_path = os.path.abspath(cfg.paths.models_path)
    ckpts_path = os.path.abspath(cfg.paths.checkpoints_path)
    os.makedirs(models_path, exist_ok=True)
    os.makedirs(ckpts_path, exist_ok=True)
    model_path = os.path.join(models_path, f"model_{out}.npz")
    ckpt_path = os.path.join(ckpts_path, f"ckpt_{out}.npz")

    ds_train = dataset_for(assembler, train_path, config=cfg)
    ds_valid = ds_train if overfit else dataset_for(assembler, valid_path, config=cfg)
    if len(ds_train) == 0:
        raise FileNotFoundError(
            f"No processed graphs found under {train_path}/{assembler}/processed "
            "— run 'gnnome-tpu build-graph --training' or 'generate-data' first")
    if len(ds_valid) == 0:
        raise FileNotFoundError(
            f"No processed graphs found under {valid_path}/{assembler}/processed")

    pos_weight = _pos_weight_from(ds_train)
    init_fn, _ = get_model(cfg.model.model)
    params, state = init_fn(jax.random.PRNGKey(cfg.train.seed), cfg.model)
    tx, train_step, eval_step = make_steps(cfg)
    opt_state = tx.init(params)

    halo_runner = None
    from ..parallel.halo import halo_supported
    if cfg.compute.mesh > 1 and halo_supported(cfg):
        # production multi-chip training: halo-exchange graph parallelism
        # (zero all-gathers), GSPMD fallback per unit
        from ..parallel import make_mesh
        halo_runner = _HaloRunner(cfg, make_mesh(cfg.compute.mesh))
        params = halo_runner.replicate(params)
        state = halo_runner.replicate(state)
        opt_state = halo_runner.replicate(opt_state)
        print(f"multi-chip training over {cfg.compute.mesh} devices "
              "(halo-exchange graph parallelism)")
    scheduler = ReduceLROnPlateau(cfg.train.lr, factor=cfg.train.decay,
                                  patience=cfg.train.patience)

    start_epoch = 0
    loss_train_hist: list[float] = []
    loss_valid_hist: list[float] = []

    if resume:
        trees = load_pytrees(ckpt_path)
        params = jax.tree_util.tree_map(lambda _, v: v, params, trees["params"])
        state = jax.tree_util.tree_map(lambda _, v: v, state, trees["state"])
        if "opt" in trees:
            leaves = [trees["opt"][str(i)] for i in range(len(trees["opt"]))]
            treedef = jax.tree_util.tree_structure(opt_state)
            opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
        meta = trees["meta"]
        start_epoch = int(meta["epoch"]) + 1
        loss_train_hist = list(np.atleast_1d(meta["loss_train"]))
        loss_valid_hist = list(np.atleast_1d(meta["loss_valid"]))
        scheduler.lr = float(meta["lr"])
        scheduler.best = float(meta["sched_best"])
        scheduler.num_bad_epochs = int(meta["sched_bad"])
        model_path = os.path.join(models_path,
                                  f"model_{out}_resumed-{cfg.train.num_epochs}.npz")
        ckpt_path = os.path.join(ckpts_path,
                                 f"ckpt_{out}_resumed-{cfg.train.num_epochs}.npz")
        print(f"Resuming from epoch {start_epoch}")

    print("----- TRAIN CONFIGURATION SUMMARY -----")
    print(f"Using device(s): {jax.devices()}")
    print(f"Seed: {cfg.train.seed}  Model path: {model_path}")
    print(f"Trainable parameters: {_count_params(params)}")
    print(f"Normalization: {cfg.model.normalization}  pos_weight: {pos_weight:.4f}")
    print("---------------------------------------")

    logger = JsonlLogger(os.path.join(ckpts_path, f"log_{out}.jsonl"),
                         cfg.wandb_mode, cfg.wandb_project, out, cfg.to_dict())

    def save_ckpt(epoch):
        meta = {"epoch": np.int64(epoch),
                "loss_train": np.asarray(loss_train_hist or [0.0]),
                "loss_valid": np.asarray(loss_valid_hist or [0.0]),
                "lr": np.float64(scheduler.lr),
                "sched_best": np.float64(scheduler.best),
                "sched_bad": np.int64(scheduler.num_bad_epochs)}
        opt_leaves = {str(i): np.asarray(l) for i, l in
                      enumerate(jax.tree_util.tree_leaves(opt_state))}
        save_pytrees(ckpt_path, params=params, state=state, meta=meta,
                     opt=opt_leaves)

    try:
        for epoch in range(start_epoch, cfg.train.num_epochs):
            t0 = time.time()
            opt_state = set_learning_rate(opt_state, scheduler.lr)
            params, state, opt_state, m_train, rng_key = _run_epoch(
                ds_train, params, state, opt_state, pos_weight, cfg, rng_np,
                rng_key, train_step, eval_step, training=True,
                halo_runner=halo_runner)
            loss_train_hist.append(m_train["loss"])

            log = {f"train/{k}": v for k, v in m_train.items()}
            log["lr_value"] = scheduler.lr
            log["epoch"] = epoch
            log["train_epoch_wall_s"] = round(time.time() - t0, 2)

            if overfit:
                # select on train loss; no validation (train.py:361-372)
                if len(loss_train_hist) == 1 or \
                        loss_train_hist[-1] < min(loss_train_hist[:-1]):
                    save_model_weights(model_path, params, state)
                    print(f"Epoch {epoch}: model saved (overfit) "
                          f"train_loss={m_train['loss']:.6f} f1={m_train['f1']:.4f}")
                save_ckpt(epoch)
                scheduler.step(m_train["loss"])
                logger.log(log)
                print(f"Epoch {epoch} ({time.time()-t0:.1f}s): "
                      f"train loss {m_train['loss']:.6f}")
                continue

            _, _, _, m_valid, rng_key = _run_epoch(
                ds_valid, params, state, opt_state, pos_weight, cfg, rng_np,
                rng_key, train_step, eval_step, training=False,
                halo_runner=halo_runner)
            loss_valid_hist.append(m_valid["loss"])
            log.update({f"valid/{k}": v for k, v in m_valid.items()})
            log["epoch_wall_s"] = round(time.time() - t0, 2)

            if len(loss_valid_hist) == 1 or \
                    loss_valid_hist[-1] < min(loss_valid_hist[:-1]):
                save_model_weights(model_path, params, state)
                print(f"Epoch {epoch}: model saved! valid_loss="
                      f"{m_valid['loss']:.6f} f1={m_valid['f1']:.4f}")
            save_ckpt(epoch)
            scheduler.step(m_valid["loss"])
            logger.log(log)
            print(f"Epoch {epoch} ({time.time()-t0:.1f}s): "
                  f"train {m_train['loss']:.6f} valid {m_valid['loss']:.6f} "
                  f"lr {scheduler.lr:.2e}")
    except KeyboardInterrupt:
        print("Keyboard Interrupt... Exiting...")
    finally:
        logger.close()

    return model_path
