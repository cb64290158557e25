"""SuperPoint TorchScript weight loading: JAX forward must match torch.

The reference's SuperPointNet.pt is not shipped; a structurally identical
TorchScript module (same layer names/shapes as the MagicLeap release used by
super_point_inference) with random weights validates the loader and the JAX
re-implementation numerically against torch's forward pass.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from multimotionfusion_tpu.tracking import superpoint as sp  # noqa: E402


class SuperPointNet(torch.nn.Module):
    """MagicLeap SuperPointNet architecture (layer names match the release)."""

    def __init__(self):
        super().__init__()
        self.relu = torch.nn.ReLU(inplace=True)
        self.pool = torch.nn.MaxPool2d(kernel_size=2, stride=2)
        c1, c2, c3, c4, c5, d1 = 64, 64, 128, 128, 256, 256
        self.conv1a = torch.nn.Conv2d(1, c1, 3, 1, 1)
        self.conv1b = torch.nn.Conv2d(c1, c1, 3, 1, 1)
        self.conv2a = torch.nn.Conv2d(c1, c2, 3, 1, 1)
        self.conv2b = torch.nn.Conv2d(c2, c2, 3, 1, 1)
        self.conv3a = torch.nn.Conv2d(c2, c3, 3, 1, 1)
        self.conv3b = torch.nn.Conv2d(c3, c3, 3, 1, 1)
        self.conv4a = torch.nn.Conv2d(c3, c4, 3, 1, 1)
        self.conv4b = torch.nn.Conv2d(c4, c4, 3, 1, 1)
        self.convPa = torch.nn.Conv2d(c4, c5, 3, 1, 1)
        self.convPb = torch.nn.Conv2d(c5, 65, 1, 1, 0)
        self.convDa = torch.nn.Conv2d(c4, c5, 3, 1, 1)
        self.convDb = torch.nn.Conv2d(c5, d1, 1, 1, 0)

    def forward(self, x):
        x = self.relu(self.conv1a(x))
        x = self.relu(self.conv1b(x))
        x = self.pool(x)
        x = self.relu(self.conv2a(x))
        x = self.relu(self.conv2b(x))
        x = self.pool(x)
        x = self.relu(self.conv3a(x))
        x = self.relu(self.conv3b(x))
        x = self.pool(x)
        x = self.relu(self.conv4a(x))
        x = self.relu(self.conv4b(x))
        cPa = self.relu(self.convPa(x))
        semi = self.convPb(cPa)
        cDa = self.relu(self.convDa(x))
        desc = self.convDb(cDa)
        return semi, desc


def test_torchscript_roundtrip(tmp_path):
    torch.manual_seed(0)
    net = SuperPointNet().eval()
    path = str(tmp_path / "SuperPointNet.pt")
    torch.jit.script(net).save(path)

    params = sp.load_torchscript(path)
    assert params["conv1a.w"].shape == (3, 3, 1, 64)
    assert params["convPb.w"].shape == (1, 1, 256, 65)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (48, 64)).astype(np.float32)
    with torch.no_grad():
        semi_t, desc_t = net(torch.from_numpy(img)[None, None])
    semi_t = semi_t[0].permute(1, 2, 0).numpy()  # [H/8, W/8, 65]
    desc_t = desc_t[0].permute(1, 2, 0).numpy()

    heat, desc_j = sp.superpoint_apply(params, jnp.asarray(img))
    # compare the raw head outputs via the JAX path's intermediates:
    # reconstruct semi from the heatmap is lossy; instead check the descriptor
    # head (pre-normalisation direction) and the detector through the heatmap
    dtn = desc_t / np.linalg.norm(desc_t, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(desc_j), dtn, atol=2e-4)

    # detector: softmax over torch's semi (drop dustbin) -> depth-to-space
    e = np.exp(semi_t - semi_t.max(-1, keepdims=True))
    dense = (e / e.sum(-1, keepdims=True))[..., :64]
    hc, wc = dense.shape[:2]
    heat_t = dense.reshape(hc, wc, 8, 8).transpose(0, 2, 1, 3).reshape(hc * 8, wc * 8)
    np.testing.assert_allclose(np.asarray(heat), heat_t, atol=2e-5)
