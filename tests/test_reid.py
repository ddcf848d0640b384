"""ReID CNN + crop gather: parity against torch/cv2 oracles.

The torch oracle below is an independent functional build of the same public
BasicBlock-ResNet spec; a torch nn.Module with the reference's exact
parameter naming exercises the .t7 converter end-to-end.
"""

import cv2
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.models.reid import (
    init_reid,
    load_reid_weights,
    reid_forward,
    reid_state_dict_to_pytree,
)
from vehicle_counting_tpu.ops.crops import gather_crops


# --- torch module with the reference's parameter names ---------------------

class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, downsample):
        super().__init__()
        stride = 2 if downsample else 1
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.has_down = downsample or cin != cout
        if self.has_down:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.has_down:
            x = self.downsample(x)
        return torch.relu(x + y)


class TorchReidNet(nn.Module):
    def __init__(self, num_classes=32):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(3, 64, 3, 1, 1), nn.BatchNorm2d(64), nn.ReLU(True), nn.MaxPool2d(3, 2, 1)
        )
        self.layer1 = nn.Sequential(TorchBasicBlock(64, 64, False), TorchBasicBlock(64, 64, False))
        self.layer2 = nn.Sequential(TorchBasicBlock(64, 128, True), TorchBasicBlock(128, 128, False))
        self.layer3 = nn.Sequential(TorchBasicBlock(128, 256, True), TorchBasicBlock(256, 256, False))
        self.layer4 = nn.Sequential(TorchBasicBlock(256, 512, True), TorchBasicBlock(512, 512, False))
        self.avgpool = nn.AvgPool2d((4, 4), 1)
        self.classifier = nn.Sequential(
            nn.Linear(512, 256), nn.BatchNorm1d(256), nn.ReLU(True), nn.Dropout(), nn.Linear(256, num_classes)
        )

    def forward(self, x, reid=True):
        x = self.conv(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        x = self.avgpool(x).flatten(1)
        if reid:
            return x / x.norm(p=2, dim=1, keepdim=True)
        return self.classifier(x)


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(7)
    net = TorchReidNet()
    # randomize BN stats so eval-mode parity is meaningful
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    net.eval()
    return net


def test_embedding_parity_vs_torch(torch_net, rng):
    sd = {k: v.detach().numpy() for k, v in torch_net.state_dict().items()}
    params, stats = reid_state_dict_to_pytree(sd)

    x = rng.normal(0, 1, size=(4, 50, 50, 3)).astype(np.float32)
    with torch.no_grad():
        want = torch_net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), reid=True).numpy()
    got, _ = reid_forward(params, stats, jnp.asarray(x), train=False, reid=True)
    got = np.asarray(got)
    assert got.shape == (4, 512)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, rtol=1e-5)


def test_classifier_parity_vs_torch(torch_net, rng):
    sd = {k: v.detach().numpy() for k, v in torch_net.state_dict().items()}
    params, stats = reid_state_dict_to_pytree(sd)
    x = rng.normal(0, 1, size=(3, 50, 50, 3)).astype(np.float32)
    with torch.no_grad():
        want = torch_net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), reid=False).numpy()
    got, _ = reid_forward(params, stats, jnp.asarray(x), train=False, reid=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_t7_checkpoint_roundtrip(torch_net, tmp_path, rng):
    path = str(tmp_path / "ckpt.t7")
    torch.save({"net_dict": torch_net.state_dict(), "acc": 0.9, "epoch": 12}, path)
    params, stats = load_reid_weights(path)
    x = rng.normal(0, 1, size=(2, 50, 50, 3)).astype(np.float32)
    with torch.no_grad():
        want = torch_net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), reid=True).numpy()
    got, _ = reid_forward(params, stats, jnp.asarray(x), train=False, reid=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_init_shapes_and_train_stats(rng):
    params, stats = init_reid(jax.random.PRNGKey(0), num_classes=16)
    x = jnp.asarray(rng.normal(size=(8, 50, 50, 3)).astype(np.float32))
    logits, new_stats = reid_forward(
        params, stats, x, train=True, reid=False, dropout_key=jax.random.PRNGKey(1)
    )
    assert logits.shape == (8, 16)
    # running stats must move under train=True
    assert not np.allclose(
        np.asarray(new_stats["stem"]["mean"]), np.asarray(stats["stem"]["mean"])
    )


# --- crop gather vs cv2 -----------------------------------------------------

def _oracle_crop(frame, box, size=50):
    x1 = max(int(box[0]), 0)
    y1 = max(int(box[1]), 0)
    x2 = min(int(box[2]), frame.shape[1] - 1)
    y2 = min(int(box[3]), frame.shape[0] - 1)
    im = frame[y1:y2, x1:x2].astype(np.float32) / 255.0
    im = cv2.resize(im, (size, size))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return (im - mean) / std


def test_gather_crops_matches_cv2(rng):
    frame = rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
    boxes = np.array(
        [
            [10.3, 20.7, 60.9, 90.2],
            [0.0, 0.0, 159.0, 119.0],
            [100.0, 50.0, 130.0, 110.0],
            [-5.0, -5.0, 40.0, 40.0],  # clipped at borders
        ],
        np.float32,
    )
    got = np.asarray(
        gather_crops(jnp.asarray(frame), jnp.asarray(boxes), jnp.ones(4, bool))
    )
    for i, b in enumerate(boxes):
        want = _oracle_crop(frame, b)
        np.testing.assert_allclose(got[i], want, rtol=1e-3, atol=2e-3)


def test_gather_crops_invalid_zeroed(rng):
    frame = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    boxes = np.array([[5, 5, 30, 30], [10, 10, 40, 40]], np.float32)
    valid = jnp.asarray([True, False])
    got = np.asarray(gather_crops(jnp.asarray(frame), jnp.asarray(boxes), valid))
    assert np.all(got[1] == 0)
    assert not np.all(got[0] == 0)


def test_gather_crops_degenerate_box(rng):
    frame = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    boxes = np.array([[50, 50, 50, 50]], np.float32)  # zero size
    got = np.asarray(gather_crops(jnp.asarray(frame), jnp.asarray(boxes), jnp.ones(1, bool)))
    assert np.isfinite(got).all()
