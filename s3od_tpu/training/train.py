"""Training entrypoint.

CLI-compatible with the reference's Hydra UX (`model_training/train.py:72-142`):

    python -m s3od_tpu.training.train dataset=duts model=dinob backend=v5e_8 \
        optimizer.lr=2e-5 data_dir=/data

Replaces Lightning with an explicit loop: one jitted train step (device-mesh
sharded, grad-accumulated, on-device augmentation), a jitted eval step,
TensorBoard logging, top-k checkpointing by val dice, early stopping on
val_iou_loss_full, and an end-of-fit evaluation callback over the test
datasets (`train.py:24-55`).
"""

from __future__ import annotations

import logging
import sys
import time
from datetime import datetime
from pathlib import Path
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger("s3od_tpu.train")


def micro_dice_iou(sums: Dict[str, float]) -> Dict[str, float]:
    tp, fp, fn = sums.get("tp", 0.0), sums.get("fp", 0.0), sums.get("fn", 0.0)
    iou = tp / max(tp + fp + fn, 1.0)
    dice = 2 * tp / max(2 * tp + fp + fn, 1.0)
    return {"iou": iou, "dice": dice}


def _compose_loss_config(loss_cfg) -> Dict:
    """Resolve the loss group into a LossModule config.

    Mirrors the reference's fully Hydra-configurable criterion list
    (`config/loss/*.yaml` + `loss.py:236-246`): the preset supplies the
    criterion list, and overrides can replace it (`loss.criterions=[...]`),
    retune per-criterion weights (`loss.weights.<name>=<w>`), or adjust the
    multi-mask terms (`loss.full_mask_lambda=`, `loss.decay_rate=`).
    """
    import copy

    from s3od_tpu.training.loss import LOSS_PRESETS

    composed = copy.deepcopy(LOSS_PRESETS[loss_cfg.preset])
    if "criterions" in loss_cfg:
        composed["criterions"] = copy.deepcopy(loss_cfg["criterions"])
    for key in ("full_mask_lambda", "decay_rate"):
        if key in loss_cfg:
            composed[key] = float(loss_cfg[key])
    # `loss.rank_weight=N`: append the pairwise IoU-ranking criterion to
    # any preset (the from-scratch selection-head fix; see
    # LOSS_PRESETS["focal_iou_rank"] and benchmarks/exp_iou_selection.py).
    if "rank_weight" in loss_cfg:
        composed["criterions"].append(dict(
            name="rank_ious_loss", target_key="gt_ious",
            output_key="pred_iou", weight=float(loss_cfg["rank_weight"]),
            kind="rank", add_sigmoid=False,
        ))
    weights = loss_cfg.get("weights") or {}
    unknown = set(weights) - {c["name"] for c in composed["criterions"]}
    if unknown:
        raise ValueError(f"loss.weights for unknown criterions: {sorted(unknown)}")
    for crit in composed["criterions"]:
        if crit["name"] in weights:
            crit["weight"] = float(weights[crit["name"]])
    return composed


def get_experiment_name(cfg) -> str:
    """Reference naming: model_dataset_loss_timestamp (`train.py:58-69`)."""
    stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    return (
        f"{cfg.experiment_name}_{cfg.model.get('_name', 'model')}"
        f"_{cfg.dataset.get('_name', 'data')}_{cfg.loss.get('_name', 'loss')}"
        f"_{stamp}"
    )


def build_model(cfg, rng_key):
    import jax

    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.segmentation import init_segmentation_params

    mcfg = segmentation_config(
        cfg.model.encoder_name,
        num_outputs=cfg.model.num_outputs,
        features=cfg.model.features,
        use_bn=cfg.model.use_bn,
        use_clstoken=cfg.model.use_clstoken,
    )
    if cfg.get("init_checkpoint"):
        path = str(cfg.init_checkpoint)
        if path.endswith(".npz"):
            from s3od_tpu.convert import load_native

            params, bn_state = load_native(path)
        else:
            from s3od_tpu.convert import load_torch_checkpoint

            params, bn_state, _ = load_torch_checkpoint(path, mcfg)
        logger.info("initialized weights from %s", path)
    else:
        params, bn_state = init_segmentation_params(rng_key, mcfg)
        if cfg.get("pretrained_encoder"):
            # Pretrained DINOv3 encoder + fresh head — the reference's
            # default training init (`model_training/model.py:14,25`).
            from s3od_tpu.convert import load_hf_dinov3

            params["encoder"] = load_hf_dinov3(str(cfg.pretrained_encoder))
            logger.info("encoder initialized from %s", cfg.pretrained_encoder)
        else:
            logger.warning(
                "no init_checkpoint/pretrained_encoder: fully random init "
                "(the reference pulls pretrained DINOv3 encoder weights)"
            )
    return mcfg, params, bn_state


def build_teacher_model(cfg, rng_key):
    """FluxDPT teacher (`config/train_teacher.yaml` path)."""
    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.flux_teacher import (
        FluxTeacherConfig,
        init_flux_teacher_params,
    )

    base = segmentation_config(
        cfg.model.encoder_name,
        num_outputs=cfg.model.num_outputs,
        features=cfg.model.features,
        use_bn=cfg.model.use_bn,
        use_clstoken=cfg.model.use_clstoken,
    )
    tcfg = FluxTeacherConfig(
        base=base,
        flux_dim=int(cfg.model.get("flux_dim", 768)),
        use_concept_maps=bool(cfg.model.get("use_concept_maps", True)),
        use_flux_features=True,
    )
    params, state = init_flux_teacher_params(rng_key, tcfg)
    if cfg.get("pretrained_encoder"):
        from s3od_tpu.convert import load_hf_dinov3

        params["encoder"] = load_hf_dinov3(str(cfg.pretrained_encoder))
        logger.info("teacher encoder initialized from %s", cfg.pretrained_encoder)
    return base, params, state, tcfg


def train(argv: Optional[list] = None) -> Dict[str, float]:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        # Persistent compilation cache: a resumed/repeated run otherwise
        # re-pays ~7 min of remote compiles per process (the 1024px
        # train-step + aug programs).
        from s3od_tpu.aot import enable_compilation_cache

        enable_compilation_cache()

    from s3od_tpu.ops.augment import augment_batch, normalize_imagenet
    from s3od_tpu.parallel import make_mesh, shard_batch, shard_params
    from s3od_tpu.training.checkpoint import CheckpointManager, EarlyStopping
    from s3od_tpu.training.config import load_config
    from s3od_tpu.training.data import PrefetchLoader, build_dataset
    from s3od_tpu.training.loss import LossModule
    from s3od_tpu.training.optim import make_optimizer
    from s3od_tpu.training.train_step import (
        TrainState,
        make_eval_step,
        make_train_step,
    )

    args = list(argv if argv is not None else sys.argv[1:])
    config_name = "train"
    for a in list(args):
        if a.startswith("config_name="):
            config_name = a.split("=", 1)[1]
            args.remove(a)
    cfg = load_config(args, config_name=config_name)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    # Honor `backend.accelerator: cpu` (the reference passes it to
    # pl.Trainer, `train.py:117`; `config/backend/cpu.yaml`). Must happen
    # before any backend touch: under the axon relay the default backend is
    # the remote TPU, and a CLI run that asked for CPU would otherwise hang
    # on a dead relay (CLAUDE.md relay-outage gotcha).
    if str(cfg.backend.get("accelerator", "auto")).lower() == "cpu":
        import jax.extend.backend as _jeb

        jax.config.update("jax_platforms", "cpu")
        _jeb.clear_backends()
        # Virtual device count must be set AFTER the clear (CLAUDE.md);
        # gives the config's device count, like the reference's
        # 6-process CPU DDP (`config/backend/cpu.yaml`).
        jax.config.update("jax_num_cpu_devices", int(cfg.backend.devices))

    seed = int(cfg.backend.seed)
    np.random.seed(seed)

    exp_name = get_experiment_name(cfg)
    save_dir = Path(cfg.base_dir) / "checkpoints" / exp_name
    log_dir = Path(cfg.base_dir) / "logs" / exp_name

    # --- data -----------------------------------------------------------
    data_dir = Path(cfg.data_dir)
    paths = [str(data_dir / p) for p in cfg.dataset.paths]
    image_size = int(cfg.dataset.image_size)
    accum = int(cfg.backend.accumulate_grad_batches)
    n_devices_want = int(cfg.backend.devices)
    is_teacher = bool(cfg.model.get("use_flux_features"))
    if is_teacher:
        n_devices_want = 1  # batch-1 bucket shapes cannot shard over data

    mesh = make_mesh(
        dp=None, fsdp=int(cfg.backend.fsdp) if not is_teacher else 1,
        devices=jax.devices()[:n_devices_want] if n_devices_want <= len(jax.devices()) else None,
    )
    n_dev = mesh.devices.size
    flux_dir = str(cfg.flux_features_dir) if cfg.get("flux_features_dir") else None
    if is_teacher:
        # Teacher training: bucket-shaped samples + npz features force batch
        # size 1 and no accumulation (`model_training/dataset.py:352-360`);
        # samples of different resolution buckets cannot be stacked.
        accum = 1
        global_batch = 1
        if n_dev > 1:
            logger.warning("teacher training runs data batch 1; extra devices idle")
        if not flux_dir:
            raise ValueError("teacher training requires flux_features_dir")
    else:
        global_batch = int(cfg.dataset.train_batch_size) * n_dev * accum

    # dataset.cache=true: pre-decoded uint8 letterbox memmap cache (decode
    # once per dataset, not per epoch) — removes the PNG-decode host bill
    # that dominates 1024px training wall clock on few-core hosts.
    use_cache = bool(cfg.dataset.get("cache")) and not flux_dir
    train_ds = build_dataset(paths, image_size, "train",
                             float(cfg.dataset.val_split), seed,
                             cfg.get("debug_subset_fraction"),
                             flux_features_dir=flux_dir, cache=use_cache)
    val_ds = build_dataset(paths, image_size, "val",
                           float(cfg.dataset.val_split), seed,
                           flux_features_dir=flux_dir, cache=use_cache)
    augmenting = cfg.dataset.transform_mode != "test" and not is_teacher
    rrc_p = 0.5 if augmenting else 0.0
    train_loader = PrefetchLoader(
        train_ds, global_batch, shuffle=True, drop_last=True, seed=seed,
        num_threads=int(cfg.backend.num_threads), random_resized_crop_p=rrc_p,
        geometric_mode=cfg.dataset.transform_mode if augmenting else None,
    )
    val_batch = 1 if is_teacher else int(cfg.dataset.val_batch_size) * n_dev
    val_loader = PrefetchLoader(
        val_ds, val_batch, shuffle=False, drop_last=True, seed=seed,
        num_threads=int(cfg.backend.num_threads),
    )
    steps_per_epoch = max(1, len(train_loader))
    logger.info(
        "devices=%d global_batch=%d steps/epoch=%d train=%d val=%d",
        n_dev, global_batch, steps_per_epoch, len(train_ds), len(val_ds),
    )

    # --- model / optimizer ---------------------------------------------
    if is_teacher:
        mcfg, params, bn_state, teacher_cfg = build_teacher_model(
            cfg, jax.random.key(seed)
        )
    else:
        mcfg, params, bn_state = build_model(cfg, jax.random.key(seed))
        teacher_cfg = None
    grad_clip = cfg.optimizer.get("grad_clip")
    optimizer = make_optimizer(
        float(cfg.optimizer.lr),
        head_lr_mult=float(cfg.optimizer.head_lr_mult),
        weight_decay=float(cfg.optimizer.weight_decay),
        steps_per_epoch=steps_per_epoch,
        max_epochs=int(cfg.backend.max_epochs),
        hold_epochs=int(cfg.scheduler.hold_epochs),
        eta_min=float(cfg.scheduler.eta_min),
        grad_clip=float(grad_clip) if grad_clip is not None else None,
        warmup_epochs=float(cfg.scheduler.get("warmup_epochs", 0.0)),
    )
    def apply_shardings(st):
        # param_shardings is shape-based, so it applies to the optimizer
        # state too (Adam moments mirror the param shapes) — without this
        # the 2x-params moments stay replicated, defeating ZeRO-3.
        return TrainState(
            params=shard_params(st.params, mesh),
            bn_state=st.bn_state,
            opt_state=shard_params(st.opt_state, mesh),
            step=st.step,
        )

    state = apply_shardings(TrainState.create(params, bn_state, optimizer))

    compute_dtype = (
        jnp.bfloat16 if cfg.backend.precision == "bf16" else jnp.float32
    )
    mode = cfg.dataset.transform_mode
    loss_module = LossModule(_compose_loss_config(cfg.loss))

    def _decode_masks(batch):
        # Masks travel host->device as uint8 (4x fewer bytes than fp32 —
        # the upload is the dominant wall-clock term at 1024px on a
        # relay-attached device) and decode to [0,1] float on device.
        m = batch.get("masks")
        if m is not None and m.dtype == jnp.uint8:
            batch = {**batch, "masks": m.astype(jnp.float32) / 255.0}
        return batch

    def train_pre(rng, batch):
        batch = _decode_masks(batch)
        if is_teacher:
            # Teacher data gets normalization only (`dataset.py:176-178`).
            x = batch["images"].astype(jnp.float32) / 255.0
            return {**batch, "images": normalize_imagenet(x)}
        # Geometric warps already ran on the loader threads (host_geometric).
        x, m = augment_batch(rng, batch["images"], batch["masks"], mode,
                             device_geometric=False)
        return {**batch, "images": normalize_imagenet(x), "masks": m}

    def eval_pre(rng, batch):
        batch = _decode_masks(batch)
        x = batch["images"].astype(jnp.float32) / 255.0
        return {**batch, "images": normalize_imagenet(x)}

    fwd_train = fwd_eval = None
    if is_teacher:
        from s3od_tpu.models.flux_teacher import flux_teacher_forward

        def _teacher_fwd(training):
            def fn(params, bn_state, micro_batch, rope_scale):
                return flux_teacher_forward(
                    params, bn_state, micro_batch["images"],
                    micro_batch["transformer_features"],
                    micro_batch["concept_maps"], teacher_cfg,
                    training=training, compute_dtype=compute_dtype,
                )
            return fn

        fwd_train, fwd_eval = _teacher_fwd(True), _teacher_fwd(False)

    # The convT fusion upsample (models/dpt.py) wins only from per-DEVICE
    # micro-batch 8 up; under a data-sharded mesh the traced (global) shape
    # would over-trigger it, so decide on the local per-device batch here
    # (global_batch = train_batch_size * n_dev * accum -> per-device micro
    # is train_batch_size).
    convt_up = convt_up_eval = None
    if not is_teacher and n_dev > 1:
        convt_up = int(cfg.dataset.train_batch_size) >= 8
        # Eval runs unaccumulated: per-device batch is val_batch_size.
        convt_up_eval = int(cfg.dataset.val_batch_size) >= 8
    # backend.split_augment: run the on-device augmentation pipeline as
    # its OWN jitted program instead of fused into the train step. Same
    # math (aug operates on the whole global batch either way; only the
    # rng draw differs from the fused mode), but the train-step program
    # shrinks enough that the axon remote compile helper survives it —
    # synthetic-mode aug + remat fwd/bwd + accum scan at 1024px in ONE
    # program crashes the helper with HTTP 500 (r3, CLAUDE.md).
    split_aug = bool(cfg.backend.get("split_augment")) and not is_teacher
    aug_fn = None
    if split_aug:
        aug_fn = jax.jit(train_pre)
    train_step = make_train_step(
        mcfg, loss_module, optimizer, accum_steps=accum,
        compute_dtype=compute_dtype,
        preprocess_fn=None if split_aug else train_pre,
        forward_fn=fwd_train,
        remat_policy=cfg.backend.get("remat_policy"),
        convt_up=convt_up,
    )
    eval_step = make_eval_step(
        mcfg, loss_module, compute_dtype=compute_dtype, preprocess_fn=eval_pre,
        forward_fn=fwd_eval, convt_up=convt_up_eval,
    )

    # --- bookkeeping ----------------------------------------------------
    ckpt = CheckpointManager(
        str(save_dir),
        top_k=int(cfg.train_stage.checkpoint_top_k),
        monitor=cfg.train_stage.checkpoint_monitor,
        mode=cfg.train_stage.checkpoint_mode,
    )
    es_cfg = cfg.train_stage.early_stopping
    early = EarlyStopping(
        es_cfg.monitor, int(es_cfg.patience), es_cfg.mode,
        float(es_cfg.min_delta),
    )
    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(str(log_dir))
    except Exception:  # pragma: no cover
        logger.warning("tensorboard unavailable; scalar logging to stdout only")

    start_epoch = 0
    if cfg.get("checkpoint_path"):
        state, start_epoch = ckpt_restore_external(
            ckpt, state, cfg.checkpoint_path, bool(cfg.get("weights_only")),
            steps_per_epoch=steps_per_epoch,
        )
        # Orbax restores host-numpy trees: re-apply the mesh shardings or a
        # resumed multi-device run silently trains fully replicated (OOMs
        # where the fresh start fit sharded).
        state = apply_shardings(state)
        if start_epoch:
            logger.info("resuming at epoch %d (step %d)", start_epoch,
                        int(state.step))

    base_rng = jax.random.key(seed + 1)
    max_epochs = int(cfg.backend.max_epochs)
    final_metrics: Dict[str, float] = {}

    from s3od_tpu.training.data import device_prefetch

    # One jitted program for the per-step metric accumulation: the naive
    # per-key jnp.add issues ~10 tiny dispatches per step (each a relay
    # RPC under axon).
    acc_add = jax.jit(lambda a, b: jax.tree.map(jnp.add, a, b))
    prefetch_depth = max(1, int(cfg.backend.get("device_prefetch", 2)))

    for epoch in range(start_epoch, max_epochs):
        # Per-epoch stream derived from (seed, epoch): a resumed run sees
        # the same augmentation randomness a continuous run would, instead
        # of replaying epochs 0..start-1's stream after restore. Per-step
        # keys fold in the step index (not a serial split) so the upload
        # worker can run ahead of the consumer deterministically.
        epoch_rng = jax.random.fold_in(base_rng, epoch)
        step_base = jax.random.fold_in(epoch_rng, 0)
        aug_base = jax.random.fold_in(epoch_rng, 1)
        t0 = time.time()
        acc = None
        n_steps = 0

        def put_fn(i, batch, _aug_base=aug_base):
            # Runs on the prefetch worker: upload + (optionally) dispatch
            # the augmentation program for batch i while step i-1 is still
            # computing (VERDICT r3 weak #4: 5.1 s/step wall vs ~0.4 s
            # device step — the upload must overlap the device step).
            m = batch.get("masks")
            if m is not None and m.dtype == np.float32:
                # uint8 over the wire; train_pre/eval_pre decode on device.
                batch = {**batch,
                         "masks": np.round(m * 255.0).astype(np.uint8)}
            batch = shard_batch(batch, mesh)
            if aug_fn is not None:
                # Augment per accumulation micro-slice: the synthetic
                # pipeline's temp footprint scales with the augmented
                # batch (4 GB at batch 8 on CPU analysis; the TPU
                # compile OOMs at the full global batch), and the train
                # step consumes micro-batches anyway.
                brng = jax.random.fold_in(_aug_base, i)
                slices = []
                n_g = batch["images"].shape[0]
                micro = max(1, n_g // max(1, accum))
                for j, i0 in enumerate(range(0, n_g, micro)):
                    slices.append(aug_fn(
                        jax.random.fold_in(brng, j),
                        jax.tree.map(lambda t: t[i0:i0 + micro], batch),
                    ))
                batch = jax.tree.map(
                    lambda *xs: jnp.concatenate(xs, axis=0), *slices
                )
            return batch

        for i, batch in device_prefetch(
            train_loader.epoch(epoch), put_fn, depth=prefetch_depth
        ):
            state, out = train_step(
                state, batch, jnp.asarray(float(epoch)),
                jax.random.fold_in(step_base, i),
            )
            # Device-side accumulation: no host readback (which would stall
            # the dispatch pipeline); one transfer per epoch.
            acc = out if acc is None else acc_add(acc, out)
            n_steps += 1
        if n_steps == 0:
            raise RuntimeError(
                f"train loader yielded ZERO batches in epoch {epoch}: "
                f"{len(train_ds)} train samples < global batch "
                f"{global_batch} with drop_last — shrink "
                "dataset.train_batch_size / accumulation or add data "
                "(previously this silently reported loss=nan)"
            )
        sums = (
            {k: float(v) for k, v in acc.items()} if acc is not None else {}
        )
        train_metrics = {
            f"train_{k}": v / max(1, n_steps)
            for k, v in sums.items() if k not in ("tp", "fp", "fn")
        }
        train_metrics.update(
            {f"train_{k}": v for k, v in micro_dice_iou(sums).items()}
        )

        # validation
        vsums: Dict[str, float] = {}
        n_val = 0
        for batch in val_loader.epoch(0):
            out = eval_step(state.params, state.bn_state,
                            shard_batch(batch, mesh), jnp.asarray(float(epoch)))
            host = {k: float(v) for k, v in out.items()}
            for k, v in host.items():
                vsums[k] = vsums.get(k, 0.0) + v
            if (n_val == 0 and writer and not is_teacher
                    and cfg.train_stage.get("enable_image_logging")):
                _log_val_images(
                    writer, state, batch, mcfg, compute_dtype, epoch,
                    int(cfg.train_stage.get("max_images", 8)),
                )
            n_val += 1
        if n_val == 0 and epoch == start_epoch:
            logger.warning(
                "val loader yielded ZERO batches (%d val samples < "
                "val_batch_size %d with drop_last) — val metrics will read "
                "0/nan and checkpoint selection by val_dice is meaningless; "
                "shrink dataset.val_batch_size",
                len(val_ds), int(cfg.dataset.val_batch_size),
            )
        val_metrics = {
            f"val_{k}": v / max(n_val, 1)
            for k, v in vsums.items() if k not in ("tp", "fp", "fn")
        }
        val_metrics.update(
            {f"val_{k}": v for k, v in micro_dice_iou(vsums).items()}
        )

        metrics = {**train_metrics, **val_metrics}
        final_metrics = metrics
        if writer:
            for k, v in metrics.items():
                writer.add_scalar(k, v, epoch)
            # LR monitor (reference `train.py:113`): evaluate the schedule.
            from s3od_tpu.training.optim import hold_cosine_schedule

            sched = hold_cosine_schedule(
                float(cfg.optimizer.lr),
                steps_per_epoch=steps_per_epoch,
                max_epochs=int(cfg.backend.max_epochs),
                hold_epochs=int(cfg.scheduler.hold_epochs),
                eta_min=float(cfg.scheduler.eta_min),
                # keep the logged curve identical to the optimizer's
                warmup_epochs=float(cfg.scheduler.get("warmup_epochs", 0.0)),
            )
            writer.add_scalar("lr/encoder", float(sched(int(state.step))), epoch)
            writer.add_scalar(
                "lr/head",
                float(sched(int(state.step))) * float(cfg.optimizer.head_lr_mult),
                epoch,
            )
        logger.info(
            "epoch %d (%.1fs): loss=%.4f val_loss=%.4f val_iou=%.4f val_dice=%.4f",
            epoch, time.time() - t0,
            metrics.get("train_loss", float("nan")),
            metrics.get("val_loss", float("nan")),
            metrics.get("val_iou", float("nan")),
            metrics.get("val_dice", float("nan")),
        )

        # backend.save_every=N bounds per-epoch checkpoint IO on slow disks:
        # 'last' is written every N epochs (and on the final epoch); top-k
        # score improvements always write their epochNNNN checkpoint.
        save_every = max(1, int(cfg.backend.get("save_every", 1)))
        ckpt.save(
            state, epoch=epoch, metrics=metrics,
            save_last=(
                (epoch + 1) % save_every == 0
                or epoch + 1 == int(cfg.backend.max_epochs)
            ),
        )
        if early.update(metrics):
            logger.info("early stopping at epoch %d", epoch)
            break

    # Make the final async save durable (commits 'last' + index.json).
    ckpt.wait()

    # end-of-fit evaluation callback (`train.py:24-55`)
    if not is_teacher and cfg.get("evaluation", {}).get("enabled"):
        try:
            from s3od_tpu.evaluation.compute_metrics import evaluate_datasets

            results = evaluate_datasets(
                model_params=(state.params, state.bn_state, mcfg),
                input_dir=str(cfg.evaluation.input_dir),
                datasets=list(cfg.dataset.test_datasets),
                # evaluation.image_size wins; else the dataset's eval
                # canvas (dis2048.yaml sets 2048); else 1024.
                image_size=int(
                    cfg.evaluation.get("image_size")
                    or cfg.dataset.get("eval_image_size", 1024)
                ),
            )
            for ds_name, ms in results.items():
                for k, v in ms.items():
                    if writer:
                        writer.add_scalar(f"evaluation/{ds_name}/{k}", v)
        except Exception as e:  # pragma: no cover
            logger.warning("final evaluation failed: %s", e)

    if writer:
        writer.close()
    ckpt.export_inference(state, str(save_dir / "s3od_final.npz"))
    return final_metrics


def _log_val_images(writer, state, batch, mcfg, compute_dtype, epoch,
                    max_images):
    """Side-by-side panels on the first val batch
    (reference `lightning_module.py:269-283`)."""
    import jax
    import jax.numpy as jnp

    from s3od_tpu.models.segmentation import segmentation_forward
    from s3od_tpu.ops.augment import normalize_imagenet
    from s3od_tpu.training.image_logger import ImageLogger

    images = jnp.asarray(batch["images"][:max_images])
    x = normalize_imagenet(images.astype(jnp.float32) / 255.0)
    out, _ = segmentation_forward(
        state.params, state.bn_state, x.astype(compute_dtype), mcfg,
        training=False, compute_dtype=compute_dtype,
    )
    gt = np.asarray(batch["masks"][:max_images])
    if gt.dtype == np.uint8:  # cached loader ships masks uint8 0..255
        gt = gt.astype(np.float32) / 255.0
    logger_ = ImageLogger(max_images)
    logger_.maybe_add(
        np.asarray(x),
        np.asarray(jax.nn.sigmoid(out["pred_masks"])),
        np.asarray(out["pred_iou"]),
        gt,
    )
    logger_.flush(writer, "val", epoch)


def ckpt_restore_external(ckpt, state, path: str, weights_only: bool,
                          *, steps_per_epoch: int = 1):
    """Resume from an explicit checkpoint directory path.

    Returns (state, start_epoch). Full resume continues from the saved
    epoch — the reference's Lightning `ckpt_path` restores the whole Trainer
    including epoch (`model_training/train.py:135-140`), which matters here
    because the multi-mask loss decay is exp(-decay_rate*epoch)
    (`loss.py:226`). The epoch comes from the manager's index.json when the
    checkpoint is one of ours, else from step // steps_per_epoch.
    """
    import json

    import jax

    from s3od_tpu.training.train_step import TrainState

    ckpt.wait()  # commit any in-flight save so 'last' + index are durable
    path_p = Path(path).resolve()
    restored = ckpt.ckptr.restore(
        path_p,
        target=jax.device_get(
            {
                "params": state.params,
                "bn_state": state.bn_state,
                "opt_state": state.opt_state,
                "step": state.step,
            }
        ),
    )
    if weights_only:
        # Weights-only init (reference `train.py:127-133`): fresh optimizer,
        # schedules, and epoch counter.
        return TrainState(
            params=restored["params"], bn_state=restored["bn_state"],
            opt_state=state.opt_state, step=state.step,
        ), 0

    start_epoch = int(restored["step"]) // max(1, steps_per_epoch)
    index_path = path_p.parent / "index.json"
    if index_path.exists():
        try:
            index = json.loads(index_path.read_text())
            for entry in [index.get("last")] + list(index.get("best", [])):
                if entry and entry.get("path") == path_p.name:
                    start_epoch = int(entry["epoch"]) + 1
                    break
        except (json.JSONDecodeError, KeyError, TypeError):
            pass
    return TrainState(
        params=restored["params"], bn_state=restored["bn_state"],
        opt_state=restored["opt_state"], step=restored["step"],
    ), start_epoch


if __name__ == "__main__":
    train()
