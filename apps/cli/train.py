#!/usr/bin/env python
"""Training CLI: preprocess -> extract -> index -> fine-tune
(reference subprocess CLIs: infer/modules/train/{preprocess,extract_f0_print,
extract_feature_print,train}.py + web.py train tab orchestration, all as one
tool with subcommands)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def cmd_preprocess(args):
    from tpu_rvc.train.preprocess import preprocess_dataset
    preprocess_dataset(args.input_dir, args.sr, args.workers, args.exp_dir,
                       per=args.per)
    print("preprocess done:", args.exp_dir)


def cmd_extract(args):
    from tpu_rvc.train.extract import extract_f0, extract_features
    if args.if_f0:
        logs = extract_f0(args.exp_dir, f0_method=args.f0_method,
                          rmvpe_root=args.rmvpe_root)
        for line in logs:
            print(line)
    if args.hubert == "none":  # f0-only pass (CI runners without the
        print("extract done (features skipped: --hubert none)")  # real ckpt)
        return
    logs = extract_features(args.exp_dir, version=args.version,
                            hubert_path=args.hubert)
    for line in logs:
        print(line)
    print("extract done")


def cmd_index(args):
    import numpy as np
    from tpu_rvc.retrieval.index import build_index
    feat_dir = os.path.join(
        args.exp_dir, "3_feature256" if args.version == "v1" else "3_feature768")
    feats = np.concatenate(
        [np.load(os.path.join(feat_dir, n))
         for n in sorted(os.listdir(feat_dir))], axis=0)
    idx = build_index(feats, args.version)
    out = os.path.join(args.exp_dir, f"added_{args.name}.tpuidx.npz")
    idx.save(out, write_big_npy=args.big_npy)
    print(f"index: {idx.vectors.shape} -> {out}")


def cmd_train(args):
    from tpu_rvc.core.config import hparams_for
    from tpu_rvc.train.loop import run_training
    wants_multihost = (args.multihost or args.coordinator
                       or args.num_processes is not None
                       or args.process_id is not None)
    if wants_multihost:
        if not (args.multihost or args.coordinator):
            # silently training standalone while the other hosts wait
            # would write conflicting checkpoints — refuse instead
            raise SystemExit(
                "--num-processes/--process-id require --coordinator "
                "ip:port (or --multihost for pod auto-detection)")
        # join the multi-host job BEFORE first backend use (reference
        # DDP init role, train.py:102-217); identical command on every
        # host, differing only in --process-id
        from tpu_rvc.parallel import multihost
        multihost.initialize(
            coordinator_address=args.coordinator or None,
            num_processes=args.num_processes,
            process_id=args.process_id)
    hp = hparams_for(args.version, args.sr)
    import dataclasses
    hp = dataclasses.replace(
        hp, train=dataclasses.replace(hp.train, batch_size=args.batch_size))
    metrics = run_training(
        args.exp_dir, hp, total_epochs=args.epochs, if_f0=bool(args.if_f0),
        save_every_epoch=args.save_every, pretrain_g=args.pretrain_g,
        pretrain_d=args.pretrain_d, name=args.name, author=args.author,
        cache_in_hbm=args.cache_in_hbm, log_fn=print)
    print("final:", metrics)


def main():
    p = argparse.ArgumentParser(description="tpu_rvc training")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("preprocess")
    sp.add_argument("--input-dir", required=True)
    sp.add_argument("--exp-dir", required=True)
    sp.add_argument("--sr", type=int, default=48000)
    sp.add_argument("--workers", type=int, default=8)
    sp.add_argument("--per", type=float, default=3.7)
    sp.set_defaults(fn=cmd_preprocess)

    se = sub.add_parser("extract")
    se.add_argument("--exp-dir", required=True)
    se.add_argument("--version", default="v2")
    se.add_argument("--if-f0", type=int, default=1)
    se.add_argument("--f0-method", default="rmvpe")
    se.add_argument("--hubert", default="assets/hubert/hubert_base.pt")
    se.add_argument("--rmvpe-root", default="assets/rmvpe")
    se.set_defaults(fn=cmd_extract)

    si = sub.add_parser("index")
    si.add_argument("--exp-dir", required=True)
    si.add_argument("--version", default="v2")
    si.add_argument("--name", default="index")
    si.add_argument("--big-npy", action="store_true")
    si.set_defaults(fn=cmd_index)

    st = sub.add_parser("train")
    st.add_argument("--exp-dir", required=True)
    st.add_argument("--version", default="v2")
    st.add_argument("--sr", type=int, default=48000)
    st.add_argument("--if-f0", type=int, default=1)
    st.add_argument("--epochs", type=int, default=20)
    st.add_argument("--batch-size", type=int, default=4)
    st.add_argument("--save-every", type=int, default=5)
    st.add_argument("--pretrain-g", default="")
    st.add_argument("--pretrain-d", default="")
    st.add_argument("--name", default="model")
    st.add_argument("--author", default="")
    st.add_argument("--cache-in-hbm", action="store_true",
                    help="keep all batches device-resident after epoch 1 "
                         "(reference if_cache_data_in_gpu, train.py:425-501)")
    st.add_argument("--multihost", action="store_true",
                    help="join a multi-host job via TPU pod metadata "
                         "auto-detection (jax.distributed.initialize())")
    st.add_argument("--coordinator", default="",
                    help="host0 ip:port for explicit multi-host init "
                         "(reference MASTER_ADDR role)")
    st.add_argument("--num-processes", type=int, default=None)
    st.add_argument("--process-id", type=int, default=None)
    st.set_defaults(fn=cmd_train)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
