"""Training orchestration (reference infer/modules/train/train.py:132-737).

run_training drives: dataset -> bucketed batches sharded over the mesh's
data axis -> jitted GAN step -> periodic checkpoints (orbax-style native
state + reference-compatible G/D .pth) -> final small-model export.

Replaces the reference's per-GPU process spawn + DDP (train.py:102-217)
with one SPMD program over a jax mesh.
"""

from __future__ import annotations

import glob
import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_rvc.core.config import HParams
from tpu_rvc.core.mesh import make_mesh
from .data import RVCDataset, BucketBatcher, write_filelist
from .step import TrainState, create_train_state, make_train_step

logger = logging.getLogger(__name__)


def save_native_checkpoint(path: str, state: TrainState) -> None:
    """Flat-npz native checkpoint (full train state incl. optimizers)."""
    flat, treedef = jax.tree_util.tree_flatten(state)
    np.savez(path, treedef=np.frombuffer(
        str(jax.tree_util.tree_structure(state)).encode(), dtype=np.uint8),
        n=len(flat),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})


def load_native_checkpoint(path: str, template: TrainState) -> TrainState:
    """Load a flat-npz checkpoint, validated leaf-by-leaf against the
    template state (count + shapes).  A truncated/corrupted file or a
    config-mismatched checkpoint raises instead of silently producing a
    wrong state (the reference's load is shape-checked too,
    infer/lib/train/utils.py:33-48)."""
    z = np.load(path, allow_pickle=False)
    tmpl_flat, treedef = jax.tree_util.tree_flatten(template)
    n = int(z["n"])
    if n != len(tmpl_flat):
        raise ValueError(
            f"{path}: checkpoint has {n} leaves, state needs "
            f"{len(tmpl_flat)} — wrong model/optimizer config?")
    flat = []
    for i, tmpl in enumerate(tmpl_flat):
        leaf = z[f"leaf_{i}"]
        t_shape = np.shape(tmpl)
        if tuple(leaf.shape) != tuple(t_shape):
            raise ValueError(
                f"{path}: leaf_{i} shape {tuple(leaf.shape)} != expected "
                f"{tuple(t_shape)}")
        flat.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, flat)


def export_reference_g_pth(path: str, g_params, epoch: int, lr: float,
                           use_f0: bool = True, num_kernels: int = 3) -> None:
    """Write a reference-layout G_*.pth (weights + metadata; optimizer state
    stays in the native checkpoint — reference format at
    infer/lib/train/utils.py:89-107)."""
    from tpu_rvc.ckpt.convert import state_dict_from_synthesizer_params
    from tpu_rvc.ckpt.torch_pth import save_pth

    sd = state_dict_from_synthesizer_params({"params": g_params},
                                            use_f0=use_f0,
                                            num_kernels=num_kernels)
    save_pth({"model": sd, "iteration": epoch, "learning_rate": lr,
              "optimizer": None}, path)


def mel_image(mel: np.ndarray) -> np.ndarray:
    """(T, M) mel -> (3, M, T) float image in [0, 1] for tensorboard
    (role of the reference's plot_spectrogram_to_numpy,
    infer/lib/train/utils.py:110-126, without matplotlib)."""
    m = np.asarray(mel, np.float32).T[::-1]  # (M, T), low freqs at bottom
    lo, hi = float(m.min()), float(m.max())
    m = (m - lo) / (hi - lo + 1e-8)
    # simple blue->yellow ramp so org/gen diffs are visible in color
    return np.stack([m, m, 1.0 - m])


def latest_checkpoint(dirpath: str, prefix: str = "state_") -> Optional[str]:
    """Highest-numbered native checkpoint (reference utils.py:129 role)."""
    paths = glob.glob(os.path.join(dirpath, f"{prefix}*.npz"))
    if not paths:
        return None
    return max(paths, key=lambda p: int(
        "".join(filter(str.isdigit, os.path.basename(p))) or 0))


def run_training(exp_dir: str, hp: HParams, *, total_epochs: int = 10,
                 if_f0: bool = True, spk_id: int = 0,
                 save_every_epoch: int = 5, batch_size: Optional[int] = None,
                 pretrain_g: str = "", pretrain_d: str = "",
                 name: str = "model", author: str = "",
                 cache_in_hbm: bool = False,
                 log_fn=None, tensorboard: bool = True,
                 mesh=None) -> Dict[str, Any]:
    """Fine-tune on a prepared experiment dir; returns final metrics.

    cache_in_hbm: after the first epoch, keep every (already sharded)
    batch resident on device and only reshuffle the batch ORDER per epoch
    — the role of the reference's if_cache_data_in_gpu
    (infer/modules/train/train.py:425-501), which likewise freezes batch
    composition once cached.  RVC fine-tune sets are tiny (~10 min of
    audio ≈ 40 MB of features), so HBM residency removes the per-step
    host->device transfer entirely.
    """
    log = log_fn or (lambda s: logger.info(s))
    # multi-host: same run_training call on every host; each host feeds
    # its rank::world rows of the identical global batch plan (reference
    # one-process-per-GPU DDP role, train.py:102-217, over DCN instead)
    from tpu_rvc.parallel import multihost as mh
    world = jax.process_count()
    primary = mh.is_primary()
    tb = None
    if tensorboard and primary:  # rank-0-only logging, train.py:604
        try:  # scalars per log_interval, like the reference (train.py:604)
            from tensorboardX import SummaryWriter
            tb = SummaryWriter(os.path.join(exp_dir, "tb"))
        except Exception:
            tb = None
    sr_tag = {32000: "32k", 40000: "40k", 48000: "48k"}[hp.data.sampling_rate]
    filelist = os.path.join(exp_dir, "filelist.txt")
    if not os.path.exists(filelist):
        write_filelist(exp_dir, hp.version, if_f0, spk_id, sr_tag)
    ds = RVCDataset(filelist, hp, if_f0=if_f0)
    bs = batch_size or hp.train.batch_size
    # mesh override: a 1-device mesh opts out of collectives — needed on
    # hosts where N virtual CPU devices share one core (the in-process
    # collective rendezvous hard-aborts when a participant is >40 s late,
    # which serialized big per-device work can hit)
    if mesh is None:
        mesh = make_mesh()
    n_data = mesh.shape["data"]
    bs = max(bs // n_data * n_data, n_data)  # divisible by data axis
    batcher = BucketBatcher(ds, bs, seed=hp.train.seed)
    steps_per_epoch = max(len(ds) // bs, 1)

    state, net_g, net_d = create_train_state(
        hp, jax.random.PRNGKey(hp.train.seed), steps_per_epoch,
        use_f0=bool(if_f0))

    # warm start / resume
    ckpt = latest_checkpoint(exp_dir)
    start_epoch = 0
    if ckpt:
        state = load_native_checkpoint(ckpt, state)
        start_epoch = int(state.step) // steps_per_epoch
        log(f"resumed from {ckpt} at epoch {start_epoch}")
    else:
        if pretrain_g and os.path.exists(pretrain_g):
            from tpu_rvc.ckpt.torch_pth import load_pth
            from tpu_rvc.ckpt.convert import synthesizer_params_from_state_dict
            sd = load_pth(pretrain_g)
            sd = sd["model"] if "model" in sd else sd.get("weight", sd)
            g_params = synthesizer_params_from_state_dict(
                {k: np.asarray(v, np.float32) for k, v in sd.items()},
                n_layers=hp.model.n_layers,
                n_ups=len(hp.model.upsample_rates),
                num_kernels=len(hp.model.resblock_kernel_sizes),
                use_f0=if_f0, has_enc_q=True, fold_weight_norm=False,
                strict=False)
            state, net_g, net_d = create_train_state(
                hp, jax.random.PRNGKey(hp.train.seed), steps_per_epoch,
                g_params=_merge_partial(state.g_params, g_params, log),
                use_f0=bool(if_f0))
            log(f"loaded pretrained G from {pretrain_g}")
        if pretrain_d and os.path.exists(pretrain_d):
            from tpu_rvc.ckpt.torch_pth import load_pth
            from tpu_rvc.ckpt.convert import discriminator_params_from_state_dict
            sd = load_pth(pretrain_d)
            sd = sd["model"] if "model" in sd else sd
            d_params = discriminator_params_from_state_dict(
                {k: np.asarray(v, np.float32) for k, v in sd.items()},
                version=hp.version)
            state = state._replace(
                d_params=_merge_partial(state.d_params, d_params, log))
            log(f"loaded pretrained D from {pretrain_d}")
    if jax.process_count() > 1:
        # only rank 0 writes checkpoints: fail loudly if the hosts see
        # different resume points (exp_dir must be on shared storage)
        from tpu_rvc.parallel.multihost import assert_same_across_hosts
        start_epoch = assert_same_across_hosts(start_epoch,
                                               "resume start_epoch")

    step_fn = make_train_step(net_g, net_d, hp, steps_per_epoch)
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)

    metrics = {}
    cache: Optional[list] = [] if cache_in_hbm else None
    cache_ready = False
    for epoch in range(start_epoch, total_epochs):
        t0 = time.time()
        n_batches = 0
        if cache_ready:
            order = np.random.default_rng(
                hp.train.seed + epoch).permutation(len(cache))
            epoch_batches = (cache[i] for i in order)
        elif world > 1:
            epoch_batches = batcher.epoch_local_slice(
                epoch, jax.process_index(), world)
        else:
            epoch_batches = batcher.epoch(epoch)
        for batch in epoch_batches:
            if not cache_ready:
                batch = mh.global_batch_from_local(batch, data_sh)
                if cache is not None:
                    cache.append(batch)
            state, metrics = step_fn(state, batch,
                                     jax.random.PRNGKey(hp.train.seed))
            n_batches += 1
            step_i = int(state.step)
            mel_org = metrics.pop("mel_org", None)
            mel_gen = metrics.pop("mel_gen", None)
            if tb is not None and step_i % hp.train.log_interval == 0:
                for k, v in metrics.items():
                    tb.add_scalar(f"train/{k}", float(v), step_i)
                tb.add_scalar(
                    "train/lr",
                    hp.train.learning_rate *
                    hp.train.lr_decay ** (step_i // max(steps_per_epoch, 1)),
                    step_i)
                # slice mel images, reference train.py:620-633
                if mel_org is not None:
                    tb.add_image("slice/mel_org", mel_image(mel_org), step_i)
                if mel_gen is not None:
                    tb.add_image("slice/mel_gen", mel_image(mel_gen), step_i)
        if cache is not None and not cache_ready and cache:
            cache_ready = True
            log(f"cached {len(cache)} batches in HBM "
                "(batch composition frozen, order reshuffles per epoch)")
        log(f"epoch {epoch + 1}/{total_epochs}: "
            f"{n_batches} steps in {time.time() - t0:.1f}s, "
            + ", ".join(f"{k}={float(v):.3f}" for k, v in metrics.items()))
        if primary and ((epoch + 1) % save_every_epoch == 0
                        or epoch + 1 == total_epochs):
            save_native_checkpoint(
                os.path.join(exp_dir, f"state_{epoch + 1}.npz"), state)
            export_reference_g_pth(
                os.path.join(exp_dir, f"G_{epoch + 1}.pth"),
                jax.device_get(state.g_params), epoch + 1,
                hp.train.learning_rate * hp.train.lr_decay ** (epoch + 1),
                use_f0=if_f0,
                num_kernels=len(hp.model.resblock_kernel_sizes))

    # final small-model export (reference train.py:721-737); rank 0 only
    if not primary:
        return {k: float(v) for k, v in metrics.items()}
    from tpu_rvc.ckpt.convert import state_dict_from_synthesizer_params
    from tpu_rvc.ckpt.small_model import save_small_model
    sd = state_dict_from_synthesizer_params(
        {"params": jax.device_get(state.g_params)}, use_f0=if_f0,
        num_kernels=len(hp.model.resblock_kernel_sizes))
    out = save_small_model(sd, sr_tag, int(if_f0), name, total_epochs,
                           hp.version, hp,
                           out_path=os.path.join(exp_dir, f"{name}.pth"),
                           author=author)
    log(f"saved small model to {out}")
    return {k: float(v) for k, v in metrics.items()}


def _merge_partial(dst, src, log):
    """Shape-checked partial load (reference utils.py:33-73 semantics)."""
    flat_dst = jax.tree_util.tree_flatten_with_path(dst)[0]
    flat_src = dict(jax.tree_util.tree_flatten_with_path(src)[0])
    out = []
    n_hit = 0
    for path, leaf in flat_dst:
        cand = flat_src.get(path)
        if cand is not None and np.shape(cand) == np.shape(leaf):
            out.append(jnp.asarray(cand, jnp.asarray(leaf).dtype))
            n_hit += 1
        else:
            out.append(leaf)
    log(f"partial load: {n_hit}/{len(flat_dst)} tensors matched")
    treedef = jax.tree_util.tree_structure(dst)
    return jax.tree_util.tree_unflatten(treedef, out)
