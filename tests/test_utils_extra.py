import json
import os

import numpy as np

from s2r_tpu.config import Config
from s2r_tpu.core.distributed import local_shard, maybe_initialize
from s2r_tpu.data.loader import make_data_loader
from s2r_tpu.utils.calculate_weights import calculate_weights_labels
from s2r_tpu.utils.profiling import StepTimer
from s2r_tpu.utils.summaries import SummaryWriter, TensorboardSummary, unnormalize


def test_calculate_weights_matches_reference_formula(tmp_path):
    cfg = Config(dataset="synthetic", crop_size=32, batch_size=2, workers=2)
    train, _, _, nclass = make_data_loader(cfg)
    path = str(tmp_path / "w.npy")
    w = calculate_weights_labels(train, nclass, path, "synthetic")
    assert w.shape == (19,)
    assert os.path.exists(path)

    # recompute the reference formula directly (calculate_weights.py:17-27)
    z = np.zeros(19)
    for batch in train:
        y = batch["src_label"]
        m = (y >= 0) & (y < 19)
        z += np.bincount(y[m].reshape(-1), minlength=19)
    expected = 1.0 / np.log(1.02 + z / z.sum())
    np.testing.assert_allclose(w, expected, rtol=1e-6)


def test_summary_writer_jsonl_and_images(tmp_path):
    w = SummaryWriter(str(tmp_path), use_tensorboard=False)
    w.add_scalar("train/loss", 1.5, 0)
    w.add_scalar("train/loss", 1.2, 1)
    w.add_image("img", np.zeros((4, 4, 3), np.float32), 0)
    w.close()
    lines = [json.loads(l) for l in
             open(os.path.join(str(tmp_path), "scalars.jsonl"))]
    assert [l["value"] for l in lines] == [1.5, 1.2]


def test_visualize_image_runs(tmp_path):
    s = TensorboardSummary(str(tmp_path))
    w = s.create_summary()
    rng = np.random.RandomState(0)
    image = rng.randn(4, 16, 16, 3).astype(np.float32)
    target = rng.randint(0, 19, (4, 16, 16))
    output = rng.randn(4, 16, 16, 19).astype(np.float32)
    s.visualize_image(w, "gtav2cityscapes", image, target, output, 0)
    w.close()


def test_unnormalize_roundtrip():
    from s2r_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    raw = np.random.RandomState(1).rand(2, 4, 4, 3).astype(np.float32)
    normalized = (raw - np.asarray(IMAGENET_MEAN, np.float32)) \
        / np.asarray(IMAGENET_STD, np.float32)
    np.testing.assert_allclose(unnormalize(normalized), raw, atol=1e-6)


def test_step_timer():
    t = StepTimer()
    for _ in range(4):
        t.tick()
    s = t.summary()
    assert s["steps"] == 3
    assert s["mean_ms"] >= 0


def test_distributed_noop_when_unconfigured(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_initialize() is False


def test_local_shard():
    assert local_shard(10, 0, 4) == [0, 4, 8]
    assert local_shard(10, 3, 4) == [3, 7]
