"""Dataset preparation + training-loop smoke test on the bundled mute
fixtures — the same flow the reference CI exercises
(.github/workflows/unitest.yml:79-84: preprocess -> f0 -> features), plus a
1-epoch tiny fine-tune through run_training."""

import os
import shutil
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_rvc.core.config import HParams, TrainConfig, DataConfig, ModelConfig
from tpu_rvc.train.preprocess import preprocess_dataset
from tpu_rvc.train.extract import extract_f0, extract_features
from tpu_rvc.train.data import write_filelist, RVCDataset, BucketBatcher, MUTE_DIR
from tpu_rvc.models.hubert import Hubert


def test_mute_assets_present():
    assert (MUTE_DIR / "0_gt_wavs" / "mute48k.wav").exists()
    assert (MUTE_DIR / "3_feature768" / "mute.npy").exists()
    f = np.load(MUTE_DIR / "3_feature768" / "mute.npy")
    assert f.shape[1] == 768


def test_preprocess_f0_features(tmp_path):
    # stage 0: a small "dataset" of one noisy file at 48k
    inp = tmp_path / "raw"
    inp.mkdir()
    rng = np.random.default_rng(0)
    sr = 48000
    t = np.arange(sr * 4) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    from tpu_rvc.audio.io import save_wav
    save_wav(str(inp / "a.wav"), wav, sr)

    exp = str(tmp_path / "exp")
    preprocess_dataset(str(inp), sr, 1, exp, per=3.7)
    gt = os.listdir(os.path.join(exp, "0_gt_wavs"))
    w16 = os.listdir(os.path.join(exp, "1_16k_wavs"))
    assert len(gt) >= 1 and len(gt) == len(w16)

    # stage 2a: f0 via pm
    logs = extract_f0(exp, f0_method="pm")
    assert not logs, logs
    f0s = os.listdir(os.path.join(exp, "2a_f0"))
    assert len(f0s) == len(w16)
    coarse = np.load(os.path.join(exp, "2a_f0", f0s[0]))
    assert coarse.dtype == np.int32 and coarse.min() >= 1

    # stage 2b: features with a tiny hubert (v2 tree layout, 768-d out)
    hub = Hubert(output_layer=1, final_proj=False, embed=768, ffn_dim=64,
                 n_heads=2, pos_conv_k=16, pos_conv_groups=2,
                 conv_layers=((32, 10, 5), (32, 4, 4), (32, 4, 4),
                              (32, 2, 2), (32, 2, 2)))
    hv = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))
    logs = extract_features(exp, version="v2", hubert=hub, hubert_vars=hv,
                            dtype=jnp.float32)
    assert not logs, logs
    feats = os.listdir(os.path.join(exp, "3_feature768"))
    assert len(feats) == len(w16)
    f = np.load(os.path.join(exp, "3_feature768", feats[0]))
    assert f.shape[1] == 768

    # stage 3: filelist + dataset + batcher
    path = write_filelist(exp, "v2", True, 0, 48000)
    lines = open(path).read().strip().split("\n")
    assert len(lines) == len(w16) + 2  # +2 mute rows

    hp = HParams(version="v2",
                 data=DataConfig(sampling_rate=48000, filter_length=1024,
                                 hop_length=480, win_length=1024,
                                 n_mel_channels=32))
    ds = RVCDataset(path, hp, if_f0=True)
    batcher = BucketBatcher(ds, batch_size=2)
    batches = list(batcher.epoch(0))
    assert batches
    b = batches[0]
    B, T, D = b["phone"].shape
    assert D == 768 and b["spec"].shape[:2] == (B, T)
    assert b["wave"].shape == (B, T * 480, 1)
    assert (b["phone_lengths"] > 0).all()


def test_bucketing_never_truncates_and_filelist_filters(tmp_path):
    """n_frames comes from the wav header (exact), so an item can never
    land in a bucket smaller than its true collate length (the old
    file-size estimate under-counted 16-bit PCM by ~1/3 and silently cut
    the tail of every utterance); rows missing the 2b-f0nsf file are
    dropped at filelist time (reference web.py:395-400 intersects all
    four dirs); batches shuffle ACROSS buckets."""
    from tpu_rvc.audio.io import save_wav
    from tpu_rvc.train.data import (BucketBatcher, RVCDataset,
                                    write_filelist, _wav_frames)

    exp = tmp_path / "exp"
    sr, hop = 48000, 480
    for d in ("0_gt_wavs", "3_feature768", "2a_f0", "2b-f0nsf"):
        (exp / d).mkdir(parents=True)
    rng = np.random.default_rng(0)
    durs = {"a": 3.5, "b": 3.5, "c": 1.0, "d": 1.0, "nof0nsf": 2.0}
    for name, dur in durs.items():
        S = int(sr * dur)
        wav = (0.3 * np.sin(2 * np.pi * 220 * np.arange(S) / sr)
               ).astype(np.float32)
        save_wav(str(exp / "0_gt_wavs" / f"{name}.wav"), wav, sr)
        n16 = int(16000 * dur)
        nfeat = (n16 - 400) // 320 + 1
        np.save(exp / "3_feature768" / f"{name}.npy",
                rng.standard_normal((nfeat, 768)).astype(np.float32))
        nf0 = S // hop + 1
        np.save(exp / "2a_f0" / f"{name}.wav.npy",
                rng.integers(1, 255, nf0).astype(np.int32))
        if name != "nof0nsf":
            np.save(exp / "2b-f0nsf" / f"{name}.wav.npy",
                    rng.uniform(100, 300, nf0).astype(np.float32))

    path = write_filelist(str(exp), "v2", True, 0, "48k")
    lines = open(path).read().strip().split("\n")
    # 4 complete rows + 2 mute rows; the row missing 2b-f0nsf is dropped
    assert len(lines) == 6
    assert not any("nof0nsf" in ln for ln in lines)

    hp = HParams(version="v2",
                 data=DataConfig(sampling_rate=sr, filter_length=1024,
                                 hop_length=hop, win_length=1024,
                                 n_mel_channels=32))
    ds = RVCDataset(path, hp, if_f0=True)
    # header-exact frame counts: estimate >= true collate length for all
    for i, it in enumerate(ds.items):
        assert it.n_frames == _wav_frames(it.wav_path, hop)
        loaded = ds.load(i)
        assert it.n_frames >= loaded["n_frames"], (
            f"{it.wav_path}: bucket estimate {it.n_frames} under true "
            f"{loaded['n_frames']} -> silent truncation")
    batcher = BucketBatcher(ds, batch_size=1, seed=7)
    # 3.5 s items (350 frames) must reach bucket 400 uncut
    for epoch in range(2):
        for b in batcher.epoch(epoch):
            n = int(b["phone_lengths"][0])
            T = b["phone"].shape[1]
            assert n <= T
            if T == 400:
                assert n >= 340  # the old estimate truncated these to 300
    # cross-bucket shuffle: some epoch interleaves bucket sizes
    def pattern(e):
        return [b["phone"].shape[1] for b in batcher.epoch(e)]
    assert any(p != sorted(p) and p != sorted(p, reverse=True)
               for p in (pattern(e) for e in range(6)))


@pytest.mark.slow
def test_tiny_finetune_on_mute(tmp_path):
    """1-epoch fine-tune end-to-end through run_training on mute fixtures."""
    exp = tmp_path / "exp"
    for sub in ("0_gt_wavs", "1_16k_wavs", "2a_f0", "2b-f0nsf",
                "3_feature256"):
        shutil.copytree(MUTE_DIR / sub, exp / sub)
    # rename fixtures to a common stem per stage layout
    (exp / "0_gt_wavs" / "mute48k.wav").rename(exp / "0_gt_wavs" / "m.wav")
    for junk in ("mute32k.wav", "mute40k.wav"):
        p = exp / "0_gt_wavs" / junk
        if p.exists():
            p.unlink()
    (exp / "1_16k_wavs" / "mute.wav").rename(exp / "1_16k_wavs" / "m.wav")
    (exp / "2a_f0" / "mute.wav.npy").rename(exp / "2a_f0" / "m.wav.npy")
    (exp / "2b-f0nsf" / "mute.wav.npy").rename(exp / "2b-f0nsf" / "m.wav.npy")
    (exp / "3_feature256" / "mute.npy").rename(exp / "3_feature256" / "m.npy")

    hp = HParams(
        version="v1",
        train=TrainConfig(segment_size=4800, batch_size=2, fp16_run=False),
        data=DataConfig(sampling_rate=48000, filter_length=1024,
                        hop_length=480, win_length=1024, n_mel_channels=32),
        model=ModelConfig(
            inter_channels=32, hidden_channels=32, filter_channels=64,
            n_heads=2, n_layers=1, kernel_size=3,
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
            upsample_rates=(10, 48), upsample_initial_channel=32,
            upsample_kernel_sizes=(20, 96), gin_channels=16, spk_embed_dim=4),
    )
    from tpu_rvc.train.loop import run_training
    # 2 epochs with cache_in_hbm: epoch 1 builds the device-resident batch
    # cache, epoch 2 replays it reshuffled (reference if_cache_data_in_gpu,
    # train.py:425-501) — same compiled step, so this costs one extra step.
    logs = []
    metrics = run_training(str(exp), hp, total_epochs=2, if_f0=True,
                           save_every_epoch=1, name="mute_test",
                           cache_in_hbm=True,
                           log_fn=lambda s: logs.append(str(s)))
    assert np.isfinite(metrics["loss_gen_all"])
    assert any("cached" in s and "HBM" in s for s in logs), logs
    assert (exp / "mute_test.pth").exists()
    assert (exp / "G_1.pth").exists()
    assert (exp / "G_2.pth").exists()
    # the exported small model loads back through the standard loader
    from tpu_rvc.models.loader import load_synthesizer
    mod, variables, meta = load_synthesizer(str(exp / "mute_test.pth"))
    assert meta["version"] == "v1"
