"""Data layer + utils tests: datasets, bucketing, sharded loaders,
checkpointing, metrics."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from pyramid_flow_tpu.data.bucket import Bucketeer, TemporalLengthBucketeer
from pyramid_flow_tpu.data.datasets import (
    ImageDataset,
    ImageTextDataset,
    LengthGroupedVideoTextDataset,
)
from pyramid_flow_tpu.data.loaders import (
    Prefetcher,
    ShardedDataset,
    create_length_grouped_video_text_dataloader,
)
from pyramid_flow_tpu.utils.checkpoint import (
    auto_resume,
    latest_checkpoint_step,
    restore_checkpoint,
    save_checkpoint,
)
from pyramid_flow_tpu.utils.metrics import MetricLogger, SmoothedValue


@pytest.fixture(scope="module")
def image_jsonl(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    items = []
    rng = np.random.default_rng(0)
    for i, (w, h) in enumerate([(64, 64), (48, 80), (80, 48), (64, 64)]):
        p = d / f"im{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(p)
        items.append({"image": str(p), "text": f"caption {i}"})
    anno = d / "anno.jsonl"
    anno.write_text("\n".join(json.dumps(x) for x in items))
    return str(anno)


@pytest.fixture(scope="module")
def latent_jsonl(tmp_path_factory):
    d = tmp_path_factory.mktemp("latents")
    items = []
    rng = np.random.default_rng(1)
    for i, t in enumerate([3, 5, 3, 5, 3, 5]):
        p = d / f"lat{i}.npy"
        np.save(p, rng.standard_normal((t, 8, 8, 16)).astype(np.float32))
        items.append({"latent": str(p), "text": f"vid {i}"})
    anno = d / "anno.jsonl"
    anno.write_text("\n".join(json.dumps(x) for x in items))
    return str(anno)


def test_image_text_dataset(image_jsonl):
    ds = ImageTextDataset(
        image_jsonl, ratios=(1.0, 3 / 5, 5 / 3),
        sizes=((32, 32), (24, 40), (40, 24)))
    assert len(ds) == 4
    item = ds[0]
    assert item["image"].shape[-1] == 3
    assert item["image"].min() >= -1.0 and item["image"].max() <= 1.0
    assert item["image"].shape[:2] in ((32, 32), (24, 40), (40, 24))


def test_length_grouped_dataset_and_bucketeer(latent_jsonl):
    ds = LengthGroupedVideoTextDataset(latent_jsonl, max_frames=8,
                                       load_text_fea=False)
    assert len(ds) == 6
    b = TemporalLengthBucketeer(ds, batch_size=2)
    batch = next(b)
    assert batch["latents"].ndim == 5
    # all items in a batch share temporal length
    assert batch["latents"].shape[2:] == (8, 8, 16)


def test_sharded_dataset(latent_jsonl):
    ds = LengthGroupedVideoTextDataset(latent_jsonl, load_text_fea=False)
    s0 = ShardedDataset(ds, rank=0, world=2)
    s1 = ShardedDataset(ds, rank=1, world=2)
    assert len(s0) == 3 and len(s1) == 3
    # sync_group: ranks 0,1 in a group of 2 see the same items
    g0 = ShardedDataset(ds, rank=0, world=4, sync_group=2)
    g1 = ShardedDataset(ds, rank=1, world=4, sync_group=2)
    np.testing.assert_array_equal(g0[0]["latent"], g1[0]["latent"])


def test_prefetcher():
    pf = Prefetcher(iter(range(5)), depth=2)
    assert [next(pf) for _ in range(5)] == list(range(5))
    pf.close()


def test_loader_factory(latent_jsonl):
    ds = LengthGroupedVideoTextDataset(latent_jsonl, load_text_fea=False)
    loader = create_length_grouped_video_text_dataloader(
        ds, batch_size=2, rank=0, world=1)
    batch = next(loader)
    assert batch["latents"].shape[0] == 2
    loader.close()


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(7)}
    out = str(tmp_path / "ckpts")
    save_checkpoint(out, 100, state)
    save_checkpoint(out, 250, state)
    assert latest_checkpoint_step(out) == 250
    target = {"params": {"w": jnp.zeros((2, 3))}, "step": jnp.asarray(0)}
    restored, step = auto_resume(out, target)
    assert step == 250
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3))


def test_metrics():
    sv = SmoothedValue(window_size=3)
    for v in [1, 2, 3, 4]:
        sv.update(v)
    assert sv.median == 3.0
    assert sv.global_avg == 2.5

    logger = MetricLogger(print_fn=lambda *a: None)
    logger.update(loss=1.0)
    logger.update(loss=2.0)
    assert logger.meters["loss"].global_avg == 1.5
    consumed = list(logger.log_every(range(5), print_freq=2, header="t"))
    assert consumed == list(range(5))


def test_metrics_epoch_log(tmp_path):
    f = str(tmp_path / "log.txt")
    logger = MetricLogger(log_file=f, print_fn=lambda *a: None)
    logger.update(loss=2.0)
    logger.write_epoch_log(3, {"lr": 1e-4})
    entry = json.loads(open(f).read().strip())
    assert entry["epoch"] == 3 and entry["train_loss"] == 2.0


def test_load_model_config_from_json(tmp_path):
    import json

    from pyramid_flow_tpu.utils.checkpoint import load_model_config

    d = tmp_path / "diffusion_transformer_384p"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "_class_name": "PyramidFluxTransformer",
        "num_layers": 4, "num_single_layers": 8,
        "attention_head_dim": 32, "num_attention_heads": 6,
        "axes_dims_rope": [8, 12, 12], "unknown_future_field": 1,
    }))
    cfg = load_model_config(str(d), "flux")
    assert cfg.num_layers == 4 and cfg.num_single_layers == 8
    assert cfg.axes_dims_rope == (8, 12, 12)
    # defaults when no json
    cfg2 = load_model_config(str(tmp_path / "missing"), "vae")
    assert cfg2.latent_channels == 16
