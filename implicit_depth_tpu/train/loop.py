"""Training orchestration (replaces pl.Trainer usage, train_bd.py:35-165).

fit() wires: dataset -> BatchLoader -> jitted sharded train step ->
interval validation -> CheckpointManager -> ExperimentLogger. Data
parallelism: batches sharded over the mesh `data` axis; XLA inserts the
gradient all-reduce.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.config import Config
from implicit_depth_tpu.data.loader import BatchLoader
from implicit_depth_tpu.data.mvs_dataset import BDSamplingConfig
from implicit_depth_tpu.data.registry import get_dataset
from implicit_depth_tpu.eval import binary_metrics as bm
from implicit_depth_tpu.models.bd_net import BDNet
from implicit_depth_tpu.models.depth_net import DepthNet
from implicit_depth_tpu.parallel import mesh as mesh_lib
from implicit_depth_tpu.train import checkpoint as ckpt_lib
from implicit_depth_tpu.train import state as state_lib
from implicit_depth_tpu.train.logging import ExperimentLogger, copy_code_state


def build_net(cfg: Config, kind: str, train_bn: bool = False):
    common = dict(
        image_encoder_name=cfg.image_encoder_name,
        matching_encoder_type=cfg.matching_encoder_type,
        feature_volume_type=cfg.feature_volume_type,
        depth_decoder_name=cfg.depth_decoder_name,
        matching_scale=cfg.matching_scale,
        matching_feature_dims=cfg.matching_feature_dims,
        num_depth_bins=cfg.matching_num_depth_bins,
        num_src_views=cfg.num_src_views,
        min_matching_depth=cfg.min_matching_depth,
        max_matching_depth=cfg.max_matching_depth,
        compute_dtype=jnp.bfloat16 if cfg.precision == 16 else jnp.float32,
        # fused warp kernel (fwd + custom-VJP bwd) on TPU; XLA path on CPU
        use_pallas_warp=jax.default_backend() not in ("cpu",),
        train_bn=train_bn,
    )
    if kind == "bd":
        return BDNet(use_prior=cfg.use_prior,
                     bd_sigmoid_multiplier=cfg.bd_sigmoid_multiplier,
                     remat_volume=cfg.remat_volume and train_bn, **common)
    return DepthNet(**common)


def build_dataset(cfg: Config, split: str, kind: str, limit_to_scan_id=None,
                  pass_frame_id: bool = False):
    cls, _ = get_dataset(cfg.dataset, None, None)
    kwargs = dict(
        pass_frame_id=pass_frame_id,
        split=split,
        mv_tuple_file_suffix=cfg.mv_tuple_file_suffix,
        tuple_info_file_location=cfg.tuple_info_file_location,
        num_images_in_tuple=cfg.num_images_in_tuple or cfg.model_num_views,
        image_height=cfg.image_height,
        image_width=cfg.image_width,
        shuffle_tuple=cfg.shuffle_tuple,
        get_bd_info=kind == "bd",
        full_depth_supervision=cfg.full_depth_supervision,
        bd_config=BDSamplingConfig(
            num_rays=cfg.num_rays,
            samples_per_ray=cfg.samples_per_ray,
            near_surface_ratio=cfg.near_surface_ratio,
            surface_noise_type=cfg.surface_noise_type,
        ),
        limit_to_scan_id=limit_to_scan_id,
        skip_frames=cfg.skip_frames,
        include_full_res_depth=cfg.high_res_validation,
    )
    if cfg.dataset == "hypersim":
        kwargs["use_min_max_depth"] = cfg.use_min_max_depth
    if cfg.dataset == "synthetic":
        for k in ("mv_tuple_file_suffix", "tuple_info_file_location",
                  "num_images_in_tuple", "limit_to_scan_id", "skip_frames"):
            kwargs.pop(k, None)
        return cls(num_views=cfg.model_num_views,
                   num_frames=cfg.synthetic_num_frames, **kwargs)
    return cls(dataset_path=cfg.dataset_path, **kwargs)


def _batch_to_jnp(batch):
    cur, src = batch
    cur = {k: np.asarray(v) for k, v in cur.items() if k != "frame_id_string"}
    src = {k: np.asarray(v) for k, v in src.items() if k != "frame_id_string"}
    return cur, src


def _log_bd_panels(logger: ExperimentLogger, step: int, cur: dict, pred) -> None:
    """Validation image panels (bd_model.py:558-645): input RGB, GT depth,
    binary target and prediction at the first query plane, for up to 4
    batch elements."""
    from implicit_depth_tpu.data.mvs_dataset import reverse_imagenet_normalize
    from implicit_depth_tpu.utils.visualization import colormap_image, prepare_image_for_logging

    image = np.asarray(cur["image"])
    depth = np.asarray(cur["depth"])
    rendered = np.asarray(cur["rendered_depth"])
    pred = np.asarray(pred)
    for j in range(min(image.shape[0], 4)):
        logger.log_image(step, f"val/image/{j}",
                         np.clip(reverse_imagenet_normalize(image[j]), 0, 1))
        logger.log_image(step, f"val/depth/{j}",
                         colormap_image(depth[j, ..., 0]))
        mask = (np.nan_to_num(depth[j, ..., 0]) > 0) & (rendered[j, ..., 0] > 0)
        target = (rendered[j, ..., 0] < depth[j, ..., 0]) & mask
        logger.log_image(step, f"val/target/{j}",
                         prepare_image_for_logging(target.astype(np.float32), normalize=False))
        logger.log_image(step, f"val/pred/{j}",
                         prepare_image_for_logging(pred[j, ..., 0] * mask, normalize=False))


def fit(cfg: Config, kind: str = "bd", max_steps: Optional[int] = None,
        log_cb: Optional[Callable] = None) -> state_lib.TrainState:
    """Runs training end-to-end; returns the final state."""
    max_steps = max_steps or cfg.max_steps
    if cfg.jax_distributed:
        # multi-host: join the cluster BEFORE any device query; the mesh
        # below then spans every process's chips (SURVEY §2.6)
        from implicit_depth_tpu.parallel import distributed as dist

        dist.initialize(cfg.coordinator_address,
                        cfg.distributed_num_processes,
                        cfg.distributed_process_id)
    pid, pcount = jax.process_index(), jax.process_count()
    is_main = pid == 0
    mesh = mesh_lib.make_mesh()
    n_dev = mesh.devices.size

    net = build_net(cfg, kind, train_bn=True)
    train_ds = build_dataset(cfg, "train", kind)
    val_ds = build_dataset(cfg, "val", kind)

    # deterministic data-order resume: epoch order is a pure function of
    # (seed, epoch); a resumed run skips the already-consumed batches at
    # the index level (+1 for the init batch drawn below)
    resume_step = 0
    if cfg.resume:
        try:
            meta = ckpt_lib.load_meta(cfg.resume)
            resume_step = int(meta.get("step", meta["metrics"]["step"]))
        except (OSError, KeyError, ValueError, TypeError):
            # older/hand-built checkpoints lack the meta step; the state's
            # own step counter equals it by construction
            resume_step = ckpt_lib.peek_step(cfg.resume)
            print(f"resume: meta.json lacks 'step'; deriving data-order "
                  f"offset from state.step={resume_step}")
    # each process loads its contiguous slice of every global batch (the
    # DataLoader-per-rank contract of the reference's DDP, train_bd.py:84-114)
    loader = BatchLoader(train_ds, cfg.batch_size, num_workers=cfg.num_workers,
                         seed=cfg.random_seed, start_batch=resume_step,
                         shard_id=pid, num_shards=pcount)
    val_loader = BatchLoader(val_ds, cfg.val_batch_size, shuffle=False,
                             num_workers=cfg.num_workers, epochs=1,
                             shard_id=pid, num_shards=pcount)

    # ---- init / restore
    it = iter(loader)
    first = _batch_to_jnp(next(it))
    rngs = {"params": jax.random.PRNGKey(cfg.random_seed),
            "aug": jax.random.PRNGKey(cfg.random_seed + 1)}
    cur0 = {k: jnp.asarray(v) for k, v in first[0].items()}
    src0 = {k: jnp.asarray(v) for k, v in first[1].items()}
    variables = net.init(rngs, cur0, src0)

    if cfg.load_weights_from_checkpoint:
        variables = ckpt_lib.load_params(cfg.load_weights_from_checkpoint, variables)
    elif cfg.lazy_load_weights_from_checkpoint:
        src_vars = ckpt_lib.load_params(cfg.lazy_load_weights_from_checkpoint, variables)
        merged, n = ckpt_lib.lazy_load_params(src_vars.get("params", {}),
                                              variables["params"])
        print(f"lazy-loaded {n} parameter tensors")
        variables = dict(variables, params=merged)

    tx = state_lib.make_optimizer(cfg.lr, cfg.wd, cfg.lr_steps)
    state = state_lib.create_train_state(variables, tx)
    if cfg.resume:
        state = ckpt_lib.restore_state(cfg.resume, state)

    # ---- sharding (commit-first replicate: see mesh_lib.replicate)
    state = mesh_lib.replicate(mesh, state)
    bshard = mesh_lib.batch_sharding(mesh)

    if pcount > 1:
        from implicit_depth_tpu.parallel import distributed as dist

        def put_batch(tree):
            # assemble per-process host slices into one global jax.Array
            return dist.global_batch(mesh, tree)
    else:
        def put_batch(tree):
            return jax.device_put(tree, bshard)

    # donate the state: params/opt-state buffers update in place instead
    # of being copied every step (~1.2 GB of HBM writes saved)
    if kind == "bd":
        step_fn = jax.jit(state_lib.make_bd_train_step(
            net,
            pos_weight=cfg.binary_loss_positive_weight,
            regularisation_weight=cfg.bd_regularisation_weight,
            edge_regularisation=cfg.bd_edge_regularision,
        ), donate_argnums=(0,))
    else:
        step_fn = jax.jit(state_lib.make_regression_train_step(net, dataset=cfg.dataset),
                          donate_argnums=(0,))

    # ---- logging, snapshot, checkpoints (rank 0 only, like Lightning)
    logger = mgr = None
    monitor, mode = ("val/harmonic_iou", "max") if kind == "bd" else ("val/loss", "min")
    if is_main:
        logger = ExperimentLogger(cfg.log_dir, cfg.name)
        try:
            copy_code_state(os.path.join(logger.dir, "code"))
        except Exception as e:
            print(f"code snapshot failed: {e}")
        # async: serialisation + disk write happen off the training thread
        mgr = ckpt_lib.CheckpointManager(os.path.join(logger.dir, "checkpoints"),
                                         monitor=monitor, mode=mode, async_write=True)
    cfg_dict = dataclasses.asdict(cfg)

    rng = jax.random.PRNGKey(cfg.random_seed + 2)

    # jitted validation step — an eager per-batch apply dispatches op-by-op
    # on TPU and dominates val_interval wall time
    net_eval = build_net(cfg, kind, train_bn=False)
    if kind == "bd":

        @jax.jit
        def val_step(variables, cur, src):
            out = net_eval.apply(variables, cur, src, method=BDNet.forward_val)
            pred = jax.nn.sigmoid(cfg.bd_sigmoid_multiplier * out["pred_0"])
            iou = bm.legacy_and_new_iou(cur["rendered_depth"], cur["depth"], pred)
            return iou, pred
    else:
        from implicit_depth_tpu.ops import image as image_ops
        from implicit_depth_tpu.train import losses as loss_lib

        @jax.jit
        def val_step(variables, cur, src):
            out = net_eval.apply(variables, cur, src)
            cur = dict(cur)
            cur["normals"] = image_ops.normals_from_depth(
                jnp.nan_to_num(jnp.where(cur["mask"], cur["depth"], jnp.nan), nan=0.0),
                cur["invK_s0"],
            )
            out = dict(out)
            out["normals_pred"] = image_ops.normals_from_depth(
                out["depth_pred_0"], cur["invK_s0"])
            l = loss_lib.regression_losses(cur, src, out, dataset=cfg.dataset)
            return l, out["depth_pred_0"]

    def run_validation(state) -> dict:
        vmetrics = []
        for bi, batch in enumerate(iter(val_loader)):
            if bi >= cfg.val_batches:
                break
            cur, src = _batch_to_jnp(batch)
            cur, src = put_batch((cur, src))
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            metrics, pred = val_step(variables, cur, src)
            vmetrics.append({k: float(v) for k, v in metrics.items()})
            if kind == "bd" and bi == 0 and logger is not None and pcount == 1:
                _log_bd_panels(logger, int(state.step), cur, pred)
        if not vmetrics:
            return {}
        return {f"val/{k}": float(np.nanmean([m[k] for m in vmetrics]))
                for k in vmetrics[0]}

    t0 = time.time()
    batch = first
    step_i = int(state.step)
    if pcount > 1:
        # align ranks before the FIRST collective (the first step's grad
        # psum, which also bootstraps the gloo/ICI transport under its
        # ~30 s key-value window): per-rank loader/compile skew must not
        # land inside that window. Coordination-service rendezvous, not
        # an XLA collective.
        from implicit_depth_tpu.parallel import distributed as dist

        dist.barrier("pre_first_step")
    while step_i < max_steps:
        cur, src = put_batch(batch)
        rng, sub = jax.random.split(rng)
        state, losses = step_fn(state, (cur, src), sub)
        step_i = int(state.step)

        if step_i % cfg.log_interval == 0:
            scalars = {f"train/{k}": float(v) for k, v in losses.items()}
            scalars["train/steps_per_sec"] = cfg.log_interval / max(time.time() - t0, 1e-9)
            scalars.update({f"data/{k}": float(v) for k, v in loader.stats().items()})
            t0 = time.time()
            if logger is not None:
                logger.log_scalars(step_i, scalars)
            if log_cb:
                log_cb(step_i, scalars)

        if step_i % cfg.val_interval == 0 or step_i >= max_steps:
            vm = run_validation(state)
            if vm and logger is not None:
                logger.log_scalars(step_i, vm)
            vm = dict(vm or {monitor: 0.0})
            vm["step"] = step_i  # recorded for deterministic data resume
            if mgr is not None:
                mgr.save(state, config=cfg_dict, metrics=vm)

        try:
            batch = _batch_to_jnp(next(it))
        except StopIteration:
            it = iter(loader)
            batch = _batch_to_jnp(next(it))

    loader.stop()
    if mgr is not None:
        mgr.wait()  # join the in-flight async checkpoint write
    if logger is not None:
        logger.close()
    return state
